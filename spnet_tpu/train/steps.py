"""Jitted train / eval steps.

The whole per-batch pipeline of the reference — on-the-fly augmentation
(`callbacks.py:319-338`), forward+loss (the compiled `custom_loss` graph),
LR mutation (`callbacks.py:396-398`), optimizer update — becomes ONE fused
XLA program per step, with optional data-parallel sharding over the mesh
('data' axis; gradients all-reduce over ICI automatically under jit with
sharded batch inputs).

L2 regularization: the reference attaches l2(1e-4) to every layer kernel
via a JSON round-trip (`models.py:47-71,401`); here it is an explicit
penalty over all 'kernel' leaves added to the loss.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp

from spnet_tpu.config import LossWeights
from spnet_tpu.ops.augment import augment_on_the_fly, geo_augment_batch
from spnet_tpu.ops.losses import loss_components, spnet_loss_pallas
from spnet_tpu.train.state import TrainState


def _jit_epoch(fn, pin_positions=(1, 2)):
    """jit the whole-epoch program (donating the TrainState carry).

    With SPNET_PIN_X_LAYOUT=1 the resident-dataset operands' layouts are
    pinned on first call to their as-delivered device Formats, which
    forbids the runtime from inserting a whole-array relayout copy at
    program binding.  That copy is the surviving theory for the round-4
    full-scale native-resolution crash: 2 x 8.15 GB transient > 16 GB
    HBM kernel-faults the worker, while 6.04 GB resident (the 384 run)
    doubles to 12 GB and survives (`scripts/probe_biglayout.py` is the
    isolating probe).  Off by default until proven on hardware.
    """
    if os.environ.get("SPNET_PIN_X_LAYOUT") != "1":
        return jax.jit(fn, donate_argnums=(0,))
    box = {}

    def wrapper(*args):
        if "fn" not in box:
            from jax.experimental.layout import Format

            shardings: list = [None] * len(args)
            ok = True
            for p in pin_positions:
                a = args[p]
                if isinstance(a, jax.Array) and hasattr(a, "format"):
                    shardings[p] = Format(a.format.layout, a.sharding)
                else:
                    ok = False
            box["fn"] = (
                jax.jit(fn, donate_argnums=(0,),
                        in_shardings=tuple(shardings))
                if ok else jax.jit(fn, donate_argnums=(0,)))
        return box["fn"](*args)

    return wrapper


def _prep_x(x):
    """Datasets may be stored as uint8 (memory/bandwidth: see
    data/dataset.py); normalize on device with the Inception scaling."""
    if x.dtype == jnp.uint8:
        return (x.astype(jnp.float32) / 255.0 - 0.5) * 2.0
    return x


#: Which kernels the L2 penalty covers.  'reference' mirrors the layers
#: the reference's add_regularization EFFECTIVELY touched (its JSON
#: round-trip only re-attached the regularizer to the stem convs, the
#: first backbone block and the final Dense — visible in the paper run
#: logs' `model.losses` list of 10 tensors; with 'all', the ~21M-kernel
#: Xception would contribute an L2 term ~15x the data loss).
L2_SCOPES = ("reference", "all", "none")


def _l2_in_scope(path, scope: str) -> bool:
    if getattr(path[-1], "key", None) != "kernel":
        return False
    if scope == "reference":
        top = getattr(path[0], "key", "")
        second = getattr(path[1], "key", "") if len(path) > 1 else ""
        return (
            top in ("stem", "final_output", "sigmoid_output",
                    "dense_output")
            or (top == "backbone" and second in ("conv1", "conv2",
                                                 "block2"))
        )
    return True


def kernel_l2(params, scope: str = "reference") -> jnp.ndarray:
    """Sum of squared conv/dense kernels (BN scales/biases excluded)."""
    if scope == "none":
        return jnp.zeros(())
    total = 0.0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        if not _l2_in_scope(path, scope):
            continue
        total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return total


def add_kernel_l2_grad(grads, params, l2_reg: float, scope: str):
    """grads += d/dp [l2_reg * kernel_l2(p)] = 2*l2_reg*p on in-scope
    kernel leaves — the analytic form, applied directly to the f32
    master weights (used by the carried-compute-params path so the L2
    term never has to read the rounded compute-dtype copies)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, g, p: (g + (2.0 * l2_reg) * p
                            if _l2_in_scope(path, scope) else g),
        grads, params,
    )


def make_train_step(
    model,
    loss_weights: LossWeights = LossWeights(),
    loss_type: str = "same",
    l2_reg: float = 1e-4,
    augment: bool = True,
    blur_prob: float = 0.0,
    use_pallas_loss: bool = False,
    l2_scope: str = "reference",
    indexed: bool = False,
    mesh=None,
    geo_augment: bool = False,
    grid=None,
    carry_compute_params: Any = None,
    carry_scope: str = "all",
    pregather: bool = True,
):
    """Returns train_step(state, x, y, rng) -> (state, metrics).

    With `geo_augment=True` (requires `grid`), every step additionally
    applies random flip / rotate / translate WITH on-device label
    re-encode (ops/augment.geo_augment_batch + ops/grid_encode) — the
    TPU-first replacement for the reference's offline 42x dataset
    inflation.  The step signatures then take the padded raw rows and
    their mask after `y`:  train_step(state, x, y, rows, mask, rng) and
    train_epoch(state, x_all, y_all, rows_all, mask_all, idx_mat, rng).
    The stored `y` is ignored in that case (recomputed from the
    transformed rows each step).

    With `indexed=True` the signature becomes
    train_step(state, x_all, y_all, idx, rng): the FULL dataset lives in
    device HBM and each step gathers its minibatch on device — zero
    per-step host->device traffic (the TPU-native replacement for host
    batch feeding; the pristine x_all plays the role of the reference's
    `X_orig` copy in AugmentOnTheFly, since augmentation is applied to
    the gathered batch only).

    With a `mesh`, the epoch program constrains the per-step batch dim
    to the mesh's data axis, so the scan is data-parallel: XLA partitions
    every step across devices and inserts the gradient/batch-stat
    all-reduces over ICI.  Semantics are identical to single-device
    (global-batch BN, global grad mean)."""

    if geo_augment and grid is None:
        raise ValueError("geo_augment=True requires the GridSpec")
    carry_dtype = (jnp.dtype(carry_compute_params)
                   if carry_compute_params is not None else None)
    if carry_dtype == jnp.float32:
        carry_dtype = None  # casting f32->f32 carries nothing

    def _cast_tree(params):
        """Compute-dtype copy of the params.  carry_scope='backbone'
        (mixed-precision split, ModelConfig.backbone_dtype): only the
        backbone subtree is rounded — stem/head params stay the f32
        masters, matching what the model's per-layer casts would do."""
        if carry_scope == "backbone" and "backbone" in params:
            return {
                **params,
                "backbone": jax.tree_util.tree_map(
                    lambda p: p.astype(carry_dtype), params["backbone"]),
            }
        return jax.tree_util.tree_map(
            lambda p: p.astype(carry_dtype), params)

    def _core_h(state: TrainState, x, y, rng, rows=None, mask=None,
                params_h=None):
        """One optimizer step.  `params_h` (epoch path, bf16 compute):
        a compute-dtype copy of the params carried ACROSS scan steps —
        the forward/backward reads it directly, so the ~300 standalone
        f32->compute convert ops per step (one per kernel, the round-3
        profile's 'weight tiles converted per use') disappear; the
        refreshed copy is produced inside the optimizer's elementwise
        update fusion, where the cast is a free extra output.
        Numerics are unchanged: the old path's autodiff THROUGH the
        per-use cast already yielded exactly grad(compute-dtype copy)
        cast back to f32 (modulo only the L2 term, which now reads the
        rounded weights the forward actually used)."""
        x = _prep_x(x)
        aug_rng, geo_rng, dropout_rng = jax.random.split(rng, 3)
        if geo_augment:
            from spnet_tpu.ops.grid_encode import encode_batch_device

            x, rows = geo_augment_batch(
                x, rows, mask, geo_rng,
                img_w=grid.img_width, img_h=grid.img_height,
            )
            y = encode_batch_device(rows, mask, grid)
        if augment:
            x = augment_on_the_fly(x, aug_rng, blur_prob=blur_prob)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            if use_pallas_loss:
                data_loss = spnet_loss_pallas(y, out, loss_weights,
                                              loss_type)
            else:
                data_loss = loss_components(y, out, loss_weights,
                                            loss_type)["total"]
            loss = data_loss
            if l2_reg and l2_scope != "none" and params_h is None:
                loss = loss + l2_reg * kernel_l2(params, l2_scope)
            return loss, (updates["batch_stats"], data_loss)

        diff_params = params_h if params_h is not None else state.params
        (loss, (new_stats, data_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(diff_params)
        if params_h is not None:
            # master weights stay f32: cast the compute-dtype grads up
            # (fuses into the Adam update chain as an input convert)
            grads = jax.tree_util.tree_map(
                lambda g, p: g.astype(p.dtype), grads, state.params)
            if l2_reg and l2_scope != "none":
                # L2 on the f32 MASTER weights, analytically — same
                # numerics as the non-carried path's autodiff'd term
                grads = add_kernel_l2_grad(grads, state.params, l2_reg,
                                           l2_scope)
                loss = loss + l2_reg * kernel_l2(state.params, l2_scope)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        metrics = {
            "loss": loss,
            "data_loss": data_loss,
            "lr": state.schedule(state.step),
        }
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        new_h = _cast_tree(new_params) if params_h is not None else None
        return new_state, metrics, new_h

    def _core(state: TrainState, x, y, rng, rows=None, mask=None):
        new_state, metrics, _ = _core_h(state, x, y, rng, rows, mask)
        return new_state, metrics

    if indexed == "epoch":

        def _epoch_core(state, x_all, y_all, idx_mat, rng,
                        rows_all=None, mask_all=None, step_offset=None):
            """One WHOLE epoch as a single device program: permute the
            device-resident dataset into (steps, batch, ...) epoch order
            ONCE, then lax.scan consumes contiguous slices — one host
            dispatch per epoch (dispatch latency dominates on remote/
            tunneled devices) and no per-step random gathers inside the
            scan (the round-1 profile showed those at 18% of summed op
            time).  The permuted copy is uint8 when the dataset is, so
            the extra HBM is bytes-per-pixel, not float32.

            With `pregather=False` the permuted copy is skipped: each
            scan step gathers its minibatch from the resident dataset
            inside the scan body (a few MB per step at recipe batch
            sizes).  This is the big-input path — at 384²+ the rank-5
            permuted-epoch reshape picks a sublane-padded TPU layout
            that 4x-inflates the u8 copy (24 GB at input_size=384 /
            40960 frames: compile-time HBM OOM), while the single
            resident copy fits comfortably."""
            steps, bs = idx_mat.shape
            # step_offset (traced int32): the global step index of this
            # program's first scan step.  A whole epoch issued as k
            # shorter chained programs (loop.py SPNET_MAX_SCAN_STEPS —
            # the workaround for the relay's long-program worker
            # crashes) folds the SAME per-step rng values as the
            # monolithic program, so the split is bit-equivalent
            # (pinned in tests/test_train_steps.py).
            if step_offset is None:
                step_offset = jnp.int32(0)
            batch_sharding = None
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from spnet_tpu.parallel.mesh import DATA_AXIS

                batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
            if pregather:
                flat = idx_mat.reshape(-1)
                x_ep = x_all[flat].reshape((steps, bs) + x_all.shape[1:])
                y_ep = y_all[flat].reshape((steps, bs) + y_all.shape[1:])
                scan_xs = {"x": x_ep, "y": y_ep,
                           "i": jnp.arange(steps) + step_offset}
                if geo_augment:
                    scan_xs["rows"] = rows_all[flat].reshape(
                        (steps, bs) + rows_all.shape[1:]
                    )
                    scan_xs["mask"] = mask_all[flat].reshape(
                        (steps, bs) + mask_all.shape[1:]
                    )
                if mesh is not None:
                    s = NamedSharding(mesh, P(None, DATA_AXIS))
                    scan_xs = {
                        k: (jax.lax.with_sharding_constraint(v, s)
                            if k != "i" else v)
                        for k, v in scan_xs.items()
                    }
            else:
                scan_xs = {"idx": idx_mat,
                           "i": jnp.arange(steps) + step_offset}

            def _shard(b):
                if batch_sharding is None or b is None:
                    return b
                return jax.lax.with_sharding_constraint(b, batch_sharding)

            def body(carry, inp):
                st, ph = carry
                if pregather:
                    xb, yb = inp["x"], inp["y"]
                    rows, mask = inp.get("rows"), inp.get("mask")
                else:
                    idx = inp["idx"]
                    xb = _shard(x_all[idx])
                    yb = _shard(y_all[idx])
                    rows = _shard(rows_all[idx]) if geo_augment else None
                    mask = _shard(mask_all[idx]) if geo_augment else None
                st, m, ph = _core_h(
                    st, xb, yb,
                    jax.random.fold_in(rng, inp["i"]),
                    rows=rows, mask=mask,
                    params_h=ph,
                )
                return (st, ph), m["loss"]

            params_h0 = (_cast_tree(state.params)
                         if carry_dtype is not None else None)
            # SPNET_SCAN_UNROLL=k replicates the scan body k times per
            # loop iteration: the round-3 profile showed the 44 ms step
            # is distributed dispatch/DMA latency across ~2,000 small
            # ops, and unrolling gives XLA a cross-STEP scheduling
            # window to overlap them (at k x program size).  Numerics
            # are identical to unroll=1 (pinned in tests).  Default 2:
            # measured 3005.0 vs 2863.7 img/s (+4.9 %) on real TPU,
            # round-4 A/B (unroll=4 gave 2994.3 — no further gain for
            # 2x the program size).  Memory-tight epochs (>4 GiB
            # resident frames, the native-resolution path on 16 GB
            # HBM) keep unroll=1 unless explicitly overridden: the
            # wider scheduling window raises peak HBM.
            default_unroll = "1" if x_all.nbytes > 4 * 1024**3 else "2"
            unroll = int(os.environ.get("SPNET_SCAN_UNROLL",
                                        default_unroll))
            (state, _), losses = jax.lax.scan(
                body, (state, params_h0), scan_xs, unroll=unroll)
            return state, losses

        if geo_augment:

            def train_epoch_geo(state, x_all, y_all, rows_all, mask_all,
                                idx_mat, rng, step_offset=None):
                return _epoch_core(state, x_all, y_all, idx_mat, rng,
                                   rows_all, mask_all, step_offset)

            return _jit_epoch(train_epoch_geo)

        def train_epoch(state, x_all, y_all, idx_mat, rng,
                        step_offset=None):
            return _epoch_core(state, x_all, y_all, idx_mat, rng,
                               step_offset=step_offset)

        return _jit_epoch(train_epoch)

    if indexed:

        def train_step_indexed(state, x_all, y_all, idx, rng):
            return _core(state, x_all[idx], y_all[idx], rng)

        return jax.jit(train_step_indexed, donate_argnums=(0,))

    if geo_augment:

        def train_step_geo(state, x, y, rows, mask, rng):
            return _core(state, x, y, rng, rows=rows, mask=mask)

        return jax.jit(train_step_geo, donate_argnums=(0,))

    return jax.jit(_core, donate_argnums=(0,))


def make_eval_step(model, loss_weights: LossWeights = LossWeights(),
                   loss_type: str = "same"):
    """Returns eval_step(state, x, y) -> (y_pred, component losses)."""

    def eval_step(state: TrainState, x, y):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            _prep_x(x),
            train=False,
        )
        comps = loss_components(y, out, loss_weights, loss_type)
        return out, comps

    return jax.jit(eval_step)


def make_predict_step(model):
    """Returns predict(params, batch_stats, x) -> y_pred (normalized)."""

    def predict(params: Any, batch_stats: Any, x):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, _prep_x(x),
            train=False,
        )

    return jax.jit(predict)
