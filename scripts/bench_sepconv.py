#!/usr/bin/env python3
"""Measure the fused separable-conv Pallas kernel vs XLA's two-conv
chain at Xception's dominant shapes (middle flow: 24 separable convs at
(B, 11, 11, 728)).  Chains N applications output->input so the timing
to value retrieval bounds the whole sequence (relay rule, CLAUDE.md).

Usage: python scripts/bench_sepconv.py [batch] [chain_len]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    chain = int(sys.argv[2]) if len(sys.argv) > 2 else 48

    import jax
    import jax.numpy as jnp
    import numpy as np

    from spnet_tpu.ops.sepconv_pallas import (
        sepconv_infer_jnp,
        sepconv_infer_pallas,
    )

    rng = np.random.default_rng(0)
    # Xception-331 shapes: middle flow 21x21x728 (16 convs), exit flow
    # 11x11 at growing widths (exit_sep3/4), plus the 42x42 level.
    # f != c shapes can't chain output->input, so those run f=c but at
    # the exit-flow widths.
    for h, w, c in ((11, 11, 728), (11, 11, 1024), (11, 11, 1536),
                    (21, 21, 728), (42, 42, 256)):
        x = jnp.asarray(
            rng.normal(0, 1, (batch, h, w, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        dw = jnp.asarray(rng.normal(0, 0.2, (3, 3, c)), jnp.float32)
        pw = jnp.asarray(rng.normal(0, 0.05, (c, c)), jnp.float32)
        # scale ~1 bias 0 keeps chained activations bounded w/ relu
        scale = jnp.full((c,), 0.5, jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)

        def chain_fn(fn, **kw):
            @jax.jit
            def run(x0):
                def body(carry, _):
                    return fn(carry, dw, pw, scale, bias, **kw), None

                out, _ = jax.lax.scan(body, x0, None, length=chain)
                return out

            return run

        results = {}
        for name, fn, kw in (
            ("xla", sepconv_infer_jnp, {}),
            ("pallas", sepconv_infer_pallas, {}),
        ):
            run = chain_fn(fn, **kw)
            r = run(x)
            float(jnp.sum(r.astype(jnp.float32)))  # compile+warm
            t0 = time.time()
            r = run(x)
            float(jnp.sum(r.astype(jnp.float32)))
            dt = time.time() - t0
            results[name] = dt / chain * 1e6  # us per layer
        print(json.dumps({
            "shape": f"b{batch}x{h}x{w}x{c}",
            "xla_us_per_layer": round(results["xla"], 1),
            "pallas_us_per_layer": round(results["pallas"], 1),
            "speedup": round(results["xla"] / results["pallas"], 3),
        }), flush=True)


if __name__ == "__main__":
    main()
