"""1-cycle learning-rate schedule, per step (batch).

Functional twin of the reference's LUT-based scheduler
(`/root/reference/spnet/callbacks.py:346-406`): linear warmup over the
first 30% of iterations from lr_max/div_factor to lr_max, then cosine
annealing down to lr_start/1e4.  The reference precomputes a numpy LUT and
mutates the optimizer per batch from a Keras callback; here it is a pure
function of the step counter that optax consumes directly, so it lives
inside the jitted update with no host involvement.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def onecycle_schedule(
    lr_max: float,
    total_steps: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div: float = 1e4,
):
    """Returns an optax-style schedule fn: step -> learning rate.

    Matches the reference LUT exactly at integer steps (linear ramp uses
    np.linspace semantics: value i of n spans [start, stop] inclusive).
    """
    lr_start = lr_max / div_factor
    lr_end = lr_start / final_div
    a1 = int(total_steps * pct_start)
    a2 = total_steps - a1

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        # linspace(start, stop, n)[i] = start + (stop-start) * i/(n-1)
        warm = lr_start + (lr_max - lr_start) * step / max(a1 - 1, 1)
        t = (step - a1) / max(a2 - 1, 1)
        cos = (lr_max - lr_end) * (1.0 + jnp.cos(jnp.pi * t)) / 2.0 + lr_end
        lr = jnp.where(step < a1, warm, cos)
        # clamp for steps beyond the schedule (extra epochs): hold lr_end
        return jnp.where(step >= total_steps, lr_end, lr)

    return sched


def onecycle_lut(
    lr_max: float,
    n_data_points: int,
    epochs: int,
    batch_size: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div: float = 1e4,
) -> np.ndarray:
    """Numpy LUT with the reference's exact construction — used as the
    test oracle and for plotting."""
    lr_start = lr_max / div_factor
    lr_end = lr_start / final_div
    n_iter = n_data_points * epochs // batch_size
    a1 = int(n_iter * pct_start)
    a2 = n_iter - a1
    first = np.linspace(lr_start, lr_max, a1)
    second = (lr_max - lr_end) * (1 + np.cos(np.linspace(0, np.pi, a2))) / 2 \
        + lr_end
    return np.concatenate([first, second])
