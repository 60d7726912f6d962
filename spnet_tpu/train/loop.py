"""The training orchestrator.

Twin of `train_network` (`/root/reference/train_spnet.py:32-85`) plus the
per-epoch diagnostics of `MyProgressCallback`
(`/root/reference/spnet/callbacks.py:113-267`), restructured around a
fused jitted train step:

  * augmentation runs ON DEVICE inside the step (no host epoch rewrite)
  * the 1-cycle LR is a schedule inside the optimizer (no callback)
  * frozen-phase -> unfreeze is an optimizer-mask swap (no model rebuild)
  * checkpoints via Orbax every `save_every` epochs + auto-resume

Per-epoch observability parity: val-set predict with FPS timing,
component losses (`losses.dat`), confusion/ring metrics, 3-panel
progress.png, overlay renders of the first 40 val frames.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from spnet_tpu.config import ExperimentConfig
from spnet_tpu.data.dataset import Dataset, batches
from spnet_tpu.eval.metrics import calc_errors
from spnet_tpu.grid import denormalize
from spnet_tpu.io.checkpoint import restore_if_exists, save_checkpoint
from spnet_tpu.io.logs import LossLog, save_progress_plot
from spnet_tpu.io.render import show_pred_ellipses
from spnet_tpu.models.spnet import build_model
from spnet_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from spnet_tpu.train.schedule import onecycle_schedule
from spnet_tpu.train.state import create_train_state, unfreeze
from spnet_tpu.train.steps import make_predict_step, make_train_step


def _to_host(o) -> np.ndarray:
    """Device output -> host numpy.  Multi-process runs return arrays
    that are not fully addressable (each process holds only its own
    devices' rows of the batch-sharded output): all-gather the full
    global value onto every host — predict_in_batches then returns the
    SAME global predictions everywhere, and each host slices out the
    rows of the local shard it fed (see train_network's val sweep)."""
    o = jax.block_until_ready(o)
    if getattr(o, "is_fully_addressable", True):
        return np.asarray(o)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(o, tiled=True))


def predict_in_batches(predict_fn, params, batch_stats, x, batch_size,
                       mesh=None, verbose=True, warmup=True):
    """Batched inference with FPS timing (the reference times every
    predict: `callbacks.py:137-141`, `evaluate_spnet.py:64-68`).

    The timed window reports STEADY-STATE throughput: the first
    dispatch triggers XLA compilation (tens of seconds on a cold
    cache), which is a property of the session, not the model — timing
    it would under-report FPS by >10x on a single sweep.  warmup=False
    restores cold-start timing."""
    m = x.shape[0]
    if warmup and m:
        wb = jnp.zeros((batch_size,) + x.shape[1:],
                       jnp.asarray(x[:1]).dtype)
        if mesh is not None and batch_size % mesh.size == 0:
            wb = shard_batch(mesh, wb)
        jax.block_until_ready(predict_fn(params, batch_stats, wb))  # compile+run
    start = time.time()
    # dispatch ALL batches first (jax dispatch is async, so batch k+1's
    # compute overlaps batch k's device->host transfer), then retrieve
    outs_dev, trims = [], []
    for s in range(0, m, batch_size):
        xb = jnp.asarray(x[s : s + batch_size])
        trim = xb.shape[0]
        if trim < batch_size:  # pad final partial batch
            pad = batch_size - trim
            xb = jnp.concatenate([xb, jnp.zeros((pad,) + xb.shape[1:],
                                                xb.dtype)])
        elif mesh is not None and xb.shape[0] % mesh.size == 0:
            xb = shard_batch(mesh, xb)
        outs_dev.append(predict_fn(params, batch_stats, xb))
        trims.append(trim)
    y = np.concatenate([_to_host(o)[:t]
                        for o, t in zip(outs_dev, trims)])
    elapsed = time.time() - start
    if verbose:
        print(f"    predict: {m} frames in {elapsed:.2f}s  "
              f"FPS = {m / max(elapsed, 1e-9):.1f}")
    return y, m / max(elapsed, 1e-9)


def train_network(
    cfg: ExperimentConfig,
    train_ds: Dataset,
    val_ds: Dataset,
    log_dir: str = "./logs/run",
    ckpt_dir: str | None = None,
    data_parallel: bool = True,
    render_overlays: bool = True,
    device_data: bool | None = None,
    verbose: int = 1,
):
    """Full training run; returns (state, model, history)."""
    tc, mc = cfg.train, cfg.model
    grid = cfg.grid
    rng = jax.random.key(tc.seed)

    model = build_model(mc, num_outputs=grid.num_outputs)
    # Multi-host: each process holds only its own file shard
    # (build_dataset shard_index/num_shards = parallel.multihost.
    # process_shard()); the GLOBAL dataset is the union, assembled on
    # device by host_to_global below.  All epoch bookkeeping (steps,
    # schedule, permutations) runs on global counts — identical on every
    # process because the permutation RNG is seeded.
    n_proc = jax.process_count()
    n_train = train_ds.x.shape[0] * n_proc
    repeats = max(int(getattr(tc, "epoch_repeats", 1)), 1)
    steps_per_epoch = (n_train // tc.batch_size) * repeats
    total_steps = steps_per_epoch * tc.epochs
    sched = onecycle_schedule(
        tc.lr_max, total_steps, tc.onecycle_pct_start,
        tc.onecycle_div_factor, tc.onecycle_final_div,
    )

    sample = jnp.zeros((tc.batch_size,) + train_ds.x.shape[1:],
                       jnp.float32)
    state = create_train_state(model, rng, sample, sched,
                               freeze_fac=tc.freeze_fac,
                               adam_variant=tc.adam_variant)
    if mc.pretrained:
        # Keras pretrained backbone (reference MobileNet imagenet path,
        # `models.py:349-355`); a checkpoint restore below still wins.
        # load_keras_backbone itself validates the backbone (all four
        # keras.applications backbones are importable since round 4).
        from spnet_tpu.io.keras_import import (
            apply_backbone_weights,
            load_keras_backbone,
        )

        bb_p, bb_s = load_keras_backbone(mc.pretrained, mc.backbone)
        p, s = apply_backbone_weights(state.params, state.batch_stats,
                                      bb_p, bb_s)
        state = state.replace(params=p, batch_stats=s)
        if verbose:
            print(f"    pretrained backbone loaded from {mc.pretrained}")
    if ckpt_dir:
        state = restore_if_exists(ckpt_dir, state)

    mesh = None
    if data_parallel and len(jax.devices()) > 1 \
            and tc.batch_size % len(jax.devices()) == 0:
        mesh = make_mesh()
        state = replicate_state(mesh, state)
        if verbose:
            print(f"    data-parallel over {mesh.size} devices"
                  + (f" / {n_proc} hosts" if n_proc > 1 else ""))
    if n_proc > 1:
        if mesh is None:
            raise ValueError(
                "multi-process training requires the data-parallel mesh "
                "(batch_size divisible by the global device count)")
        # resident global dataset is the only multi-host feed path:
        # chunk streaming / host feeding would need per-process chunk
        # coordination that nothing here requires yet
        device_data = True

    # device-resident dataset: keep the whole training set in HBM
    # (sharded over the mesh's data axis when one is active) and build
    # each epoch as ONE device program — zero per-step host->device
    # traffic.  The epoch program holds a permuted copy of X, hence the
    # 2x term in the budget.
    n_dev = mesh.size if mesh is not None else 1
    # In-scan minibatch gathers from the single resident copy are the
    # default feed: the round-5 sweep measured them FASTER than the
    # pre-gathered permuted epoch copy (3043.6 vs 2998.0 img/s,
    # VALIDATION §1 / docs/run_logs/r5_mfu.log) at half the resident
    # memory — the per-step dynamic-slice gathers were never the wall,
    # and the permuted copy adds an HBM round-trip.  The pregather path
    # stays available as a measured-negative A/B knob
    # (SPNET_PREGATHER=1; bit-equivalence with the gather feed is
    # pinned in tests/test_train_steps.py).  Memory history that bounds
    # it if re-enabled: the in-program copy wall is pinned empirically
    # between 4.5 and 5.9 GB per device (round-3 b16 runs' 4.5 GB
    # copies always lived; the round-5 dataset-D repeats=42 5.9 GB copy
    # kernel-faulted twice), and the rank-5 permuted-epoch reshape at
    # 384²/40960 frames trips a sublane-padded-layout compile-time OOM.
    pregather = False
    if os.environ.get("SPNET_PREGATHER") in ("0", "1"):
        pregather = os.environ["SPNET_PREGATHER"] == "1"
    if device_data is None:
        # budget against v5e-class HBM (16 GB): resident dataset
        # (+ permuted epoch copy when pregathering) + val, leaving
        # ~4 GB for params/opt/activations
        device_data = (
            (2 if pregather else 1) * train_ds.x.nbytes / n_dev
            + val_ds.x.nbytes < 12 * 1024**3
        )
        if not device_data:
            # dataset larger than HBM: stream fixed-size chunks instead
            # of falling all the way back to per-step host feeding
            device_data = "chunked"
    geo = bool(getattr(tc, "geo_augment", False))
    if geo and train_ds.rows is None:
        raise ValueError("geo_augment requires the dataset to carry raw "
                         "ellipse rows (Dataset.rows); rebuild it with a "
                         "current build_dataset/synthetic_dataset")
    train_step = make_train_step(
        model, cfg.loss_weights, mc.loss_type, l2_reg=mc.l2_reg,
        augment=tc.augment, blur_prob=tc.blur_prob,
        indexed="epoch" if device_data else False, mesh=mesh,
        geo_augment=geo, grid=grid, pregather=pregather,
        # carried compute-dtype params measured SLOWER on real TPU
        # (2747.5 vs 2859.7 img/s, round-4 A/B — XLA already fuses the
        # per-use converts); keep the per-use-cast default.  Opt in via
        # SPNET_CARRY_PARAMS=1 for re-measurement on newer toolchains.
        carry_compute_params=(
            (getattr(mc, "backbone_dtype", "") or mc.compute_dtype)
            if os.environ.get("SPNET_CARRY_PARAMS", "") == "1" else None),
        carry_scope=("backbone" if getattr(mc, "backbone_dtype", "")
                     else "all"),
    )
    predict_fn = make_predict_step(model)
    # full-val component losses from the (normalized) predictions, like
    # the reference's my_loss over the whole val set (callbacks.py:144-151)
    from spnet_tpu.ops.losses import loss_components

    comps_fn = jax.jit(
        lambda yt, yp: loss_components(yt, yp, cfg.loss_weights,
                                       mc.loss_type)
    )

    # val_mon: the val set used for the PER-EPOCH monitoring sweep.
    # Normally the whole val set; the device-resident branch below may
    # substitute a leading slice when HBM headroom demands it (the
    # caller's final evaluation always sees the full val_ds).
    val_mon = val_ds
    streamer = None
    if device_data == "chunked":
        from spnet_tpu.parallel.mesh import batch_sharding
        from spnet_tpu.train.chunked import ChunkStreamer, plan_chunks

        put = (
            (lambda a: jax.device_put(a, batch_sharding(mesh)))
            if mesh is not None else jax.device_put
        )
        # (chunks are budgeted at ~1/3 of HBM headroom by plan_chunks, so
        # each chunk transfer stays below the ~7 GB single-put wall)
        n_dev = mesh.size if mesh is not None else 1
        budget = int(12 * 1024**3 - val_ds.x.nbytes / n_dev)
        item_bytes = train_ds.x.nbytes // max(n_train, 1)
        chunk_len, n_chunks = plan_chunks(
            n_train, item_bytes, tc.batch_size, budget * n_dev
        )
        arrays = (train_ds.x, train_ds.y)
        if geo:
            arrays = arrays + (train_ds.rows, train_ds.row_mask)
        streamer = ChunkStreamer(arrays, chunk_len, n_chunks, put=put)
        from spnet_tpu.parallel.mesh import chunked_device_put

        x_val_dev = (
            put(jnp.asarray(val_ds.x))
            if mesh is not None and val_ds.x.shape[0] % mesh.size == 0
            else chunked_device_put(val_ds.x)
        )
        if verbose:
            print(f"    chunk-streamed dataset: "
                  f"{train_ds.x.nbytes / 1e9:.2f} GB in {n_chunks} "
                  f"chunks of {chunk_len} frames "
                  f"({chunk_len * item_bytes / 1e9:.2f} GB each, "
                  f"1-chunk-ahead prefetch)")
    elif device_data:
        from spnet_tpu.parallel.mesh import batch_sharding, chunked_device_put

        # transfers above ~7 GB crash this environment's TPU worker
        # (round-4 big-run bisect), so single-device puts go up in
        # 2 GiB leading-axis slices into a preallocated buffer; mesh
        # puts are already split per-device by the sharding.  The raw
        # numpy arrays are passed straight through — a jnp.asarray here
        # would itself perform the monolithic transfer.
        if n_proc > 1:
            from spnet_tpu.parallel.multihost import host_to_global

            # each process contributes its LOCAL shard; the global
            # batch-sharded array is what every jitted program sees
            put = lambda a: host_to_global(mesh, np.asarray(a))
        else:
            put = (lambda a: chunked_device_put(
                a, sharding=batch_sharding(mesh) if mesh is not None
                else None))
        x_all = put(train_ds.x)
        y_all = put(train_ds.y)
        if geo:
            rows_all = put(train_ds.rows)
            mask_all = put(train_ds.row_mask)
        # HBM headroom guard: the native-res (512×384 / 40960-frame)
        # epoch program needs ~6.1 GiB of temporaries on top of the
        # resident buffers with the in-scan-gather feed (measured from
        # the round-5 OOM report: 16.02 GiB used = 8.41 GiB resident +
        # 1.50 GiB pregather copy + temps, vs the 15.75 GiB v5e
        # capacity; the same run with gathers and 9.03 GB resident
        # compiles and trains).  When train+val residency would exceed
        # ~9.6e9 B per device (capacity ≈ 10.35e9 minus margin), keep
        # only a leading val slice resident for the per-epoch
        # monitoring sweep; history metrics then monitor that slice,
        # and the caller's final evaluation (host arrays) still scores
        # the full val set.
        if n_proc == 1:
            n_dev_g = mesh.size if mesh is not None else 1
            res_budget = float(os.environ.get(
                "SPNET_RESIDENT_BUDGET", 9.6e9)) * n_dev_g
            train_res = train_ds.x.nbytes + train_ds.y.nbytes
            if geo:
                train_res += (train_ds.rows.nbytes
                              + train_ds.row_mask.nbytes)
            if train_res + val_ds.x.nbytes > res_budget:
                import dataclasses as _dc

                item_v = val_ds.x.nbytes // max(val_ds.x.shape[0], 1)
                k = int(max(res_budget - train_res, 0) // max(item_v, 1))
                k = max(256, (k // 64) * 64)
                if k < val_ds.x.shape[0]:
                    val_mon = _dc.replace(
                        val_ds, x=val_ds.x[:k], y=val_ds.y[:k],
                        file_list=val_ds.file_list[:k],
                        rows=(val_ds.rows[:k]
                              if val_ds.rows is not None else None),
                        row_mask=(val_ds.row_mask[:k]
                                  if val_ds.row_mask is not None
                                  else None))
                    if verbose:
                        print(f"    val monitoring slice: {k}/"
                              f"{val_ds.x.shape[0]} frames resident "
                              f"(HBM headroom guard; the final eval "
                              f"still uses the full val set)",
                              flush=True)
        # val set sharded over the mesh too (it previously landed whole
        # on device 0, capping val-set scale and idling the mesh during
        # the per-epoch sweep)
        x_val_dev = (
            put(val_mon.x)
            if n_proc > 1 or mesh is None
            or val_mon.x.shape[0] % mesh.size == 0
            else chunked_device_put(val_mon.x)
        )
        if verbose:
            print(f"    device-resident dataset: "
                  f"{(train_ds.x.nbytes + val_mon.x.nbytes) / 1e9:.2f} GB "
                  f"in HBM"
                  + (f" (sharded over {mesh.size} devices)"
                     if mesh is not None else ""))
    else:
        x_val_dev = val_ds.x
        if verbose:
            print("    host-fed batches (dataset too large for "
                  "device-resident mode)")

    log = LossLog(log_dir)
    tb = None
    if getattr(tc, "use_tb", False):
        from spnet_tpu.io.tb import TBWriter

        tb = TBWriter(f"{log_dir}/tb")
    history = []
    frozen_left = tc.frozen_epochs if tc.freeze_fac > 0 else 0

    # resume mid-run: skip epochs already covered by the restored step
    # counter (the 1-cycle schedule keys off state.step, so the LR
    # continues exactly where it left off)
    start_epoch = int(state.step) // max(steps_per_epoch, 1)
    if start_epoch > 0:
        if start_epoch >= tc.epochs:
            print(f"    checkpoint already at epoch {start_epoch}; "
                  f"nothing to train")
        else:
            print(f"    resuming at epoch {start_epoch + 1}/{tc.epochs}")
        if tc.freeze_fac > 0:
            # completed frozen epochs stay completed across the resume:
            # only the remainder of the frozen phase is left, and the
            # backbone is unfrozen immediately if the phase already ended
            frozen_left = max(tc.frozen_epochs - start_epoch, 0)
            if frozen_left == 0:
                state = unfreeze(state, model, adam_variant=tc.adam_variant)
                if mesh is not None:
                    state = replicate_state(mesh, state)

    for epoch in range(start_epoch, tc.epochs):
        t0 = time.time()
        if device_data == "chunked":
            from spnet_tpu.train.chunked import run_chunked_epoch

            loss_sum, nb = 0.0, 0
            for r in range(repeats):
                state, r_loss, r_nb = run_chunked_epoch(
                    train_step, state, streamer, tc.batch_size,
                    rng, epoch * repeats + r, tc.seed, geo=geo,
                )
                loss_sum += r_loss * r_nb
                nb += r_nb
            ep_loss = loss_sum / max(nb, 1)
        elif device_data:
            # single device program for the whole epoch (all `repeats`
            # passes in one scan; pass r's shuffle seed is the seed the
            # (epoch*repeats + r)'th repeats=1 epoch would use)
            idx_mat = np.concatenate([
                np.stack(list(
                    batches(n_train, tc.batch_size, shuffle=True,
                            seed=tc.seed + epoch * repeats + r)
                )) for r in range(repeats)
            ]).astype(np.int32)
            nb = idx_mat.shape[0]
            # SPNET_MAX_SCAN_STEPS=k: issue the epoch as ceil(nb/k)
            # chained programs of <= k scan steps each.  Bit-equivalent
            # to the monolithic program (the traced step_offset keeps
            # the per-step rng folds global — pinned in
            # tests/test_train_steps.py); the workaround for this
            # environment's long-program worker crashes (a 3,360-step
            # geo program kernel-faults where 80-step programs always
            # lived; probe_bigprog pins the native-res crash to scan
            # length too).  Segments are equal-length whenever nb
            # divides, so the program compiles once.
            max_scan = int(os.environ.get("SPNET_MAX_SCAN_STEPS", "0"))
            seg = nb if max_scan <= 0 else min(nb, max_scan)
            n_seg = -(-nb // seg)
            seg = -(-nb // n_seg)  # rebalance: 3360/1280 -> 3x1120
            ep_rng = jax.random.fold_in(rng, epoch)
            loss_parts = []
            for s0 in range(0, nb, seg):
                seg_idx = jnp.asarray(idx_mat[s0:s0 + seg])
                off = jnp.int32(s0)
                if geo:
                    state, losses = train_step(
                        state, x_all, y_all, rows_all, mask_all,
                        seg_idx, ep_rng, off,
                    )
                else:
                    state, losses = train_step(
                        state, x_all, y_all, seg_idx, ep_rng, off,
                    )
                loss_parts.append(losses)
            ep_loss = float(jnp.mean(jnp.concatenate(loss_parts)))
        else:
            loss_parts, nb = [], 0  # device scalars; sync once per epoch

            def batch_stream():
                """Host slices -> device, one batch ahead of compute
                (device_put is async, so the next transfer overlaps the
                current step)."""
                for r in range(repeats):
                    for idx in batches(n_train, tc.batch_size,
                                       shuffle=True,
                                       seed=tc.seed + epoch * repeats + r):
                        xb = jnp.asarray(train_ds.x[idx])
                        yb = jnp.asarray(train_ds.y[idx])
                        extra = ()
                        if geo:
                            extra = (jnp.asarray(train_ds.rows[idx]),
                                     jnp.asarray(train_ds.row_mask[idx]))
                        if mesh is not None:
                            sharded = shard_batch(mesh, xb, yb, *extra)
                            xb, yb, extra = (sharded[0], sharded[1],
                                             sharded[2:])
                        yield (xb, yb) + extra

            import collections

            queue = collections.deque()
            stream = batch_stream()
            for nxt in stream:
                queue.append(nxt)
                if len(queue) < 2:
                    continue
                batch = queue.popleft()
                step_rng = jax.random.fold_in(
                    rng, epoch * steps_per_epoch + nb
                )
                state, metrics = train_step(state, *batch, step_rng)
                loss_parts.append(metrics["loss"])
                nb += 1
            while queue:
                batch = queue.popleft()
                step_rng = jax.random.fold_in(
                    rng, epoch * steps_per_epoch + nb
                )
                state, metrics = train_step(state, *batch, step_rng)
                loss_parts.append(metrics["loss"])
                nb += 1
            ep_loss = (float(np.mean(jax.device_get(loss_parts)))
                       if nb else 0.0)
        train_time = time.time() - t0
        img_per_sec = nb * tc.batch_size / max(train_time, 1e-9)

        # ---- unfreeze transition (reference `train_spnet.py:74-78`) ----
        if tc.freeze_fac > 0 and frozen_left > 0:
            frozen_left -= 1
            if frozen_left == 0:
                if verbose:
                    print("    unfreezing backbone")
                state = unfreeze(state, model, adam_variant=tc.adam_variant)
                if mesh is not None:
                    state = replicate_state(mesh, state)

        # ---- epoch-end diagnostics ----
        # eval-mode predictions are batch-size independent; use a larger
        # inference batch than the train batch so the per-epoch val sweep
        # is a handful of dispatches instead of hundreds (dispatch
        # latency dominates through the device tunnel)
        infer_bs = mc.clamp_infer_batch(
            max(tc.batch_size, min(256, int(np.asarray(
                x_val_dev.shape[0])))))
        if os.environ.get("SPNET_INFER_BS"):
            infer_bs = mc.clamp_infer_batch(
                int(os.environ["SPNET_INFER_BS"]))
        y_pred, fps = predict_in_batches(
            predict_fn, state.params, state.batch_stats, x_val_dev,
            infer_bs, mesh=mesh, verbose=verbose > 1,
        )
        if n_proc > 1:
            # predictions are global (all-gathered); metrics below
            # compare against this host's LOCAL val labels, so slice
            # the rows this host contributed: host_to_global lays
            # process p's shard at global rows [p*nl, (p+1)*nl)
            # (jax.devices() device order is process-major)
            nl = val_mon.x.shape[0]
            y_pred = y_pred[jax.process_index() * nl
                            : (jax.process_index() + 1) * nl]
        # component losses over the monitored val set (reference
        # callbacks.py:144-151), from the already-collected predictions
        comps = comps_fn(jnp.asarray(val_mon.y), jnp.asarray(y_pred))
        comps_np = {k: float(v) for k, v in comps.items()}

        if mc.loss_type != "same":  # decode noobj logits
            from spnet_tpu.config import IND_NOOBJ, VARS_PER_PRED

            y_pred[:, IND_NOOBJ::VARS_PER_PRED] = 1.0 / (
                1.0 + np.exp(-y_pred[:, IND_NOOBJ::VARS_PER_PRED])
            )
        yv = denormalize(val_mon.y, grid)
        yp = denormalize(y_pred, grid)
        st = calc_errors(yp, yv)
        log.append(
            epoch, ep_loss, comps_np, st.class_acc,
            extra={
                "ring_acc": st.ring_acc,
                "mean_pix_err": st.mean_pix_err,
                "img_per_sec": img_per_sec,
                "val_fps": fps,
                "lr": float(state.schedule(state.step)),
            },
        )
        history.append(
            {
                "epoch": epoch,
                "train_loss": ep_loss,
                "val_comps": comps_np,
                "ring_acc": st.ring_acc,
                "class_acc": st.class_acc,
                "mean_pix_err": st.mean_pix_err,
                "img_per_sec": img_per_sec,
                "val_fps": fps,
            }
        )
        if verbose:
            print(
                f"epoch {epoch + 1}/{tc.epochs}  loss {ep_loss:.5f}  "
                f"val {comps_np['total']:.5f}  "
                f"ring_acc {st.ring_acc:.2f}%  "
                f"class_acc {st.class_acc:.2f}%  "
                f"pix_err {st.mean_pix_err:.2f}  "
                f"{img_per_sec:.1f} img/s  val_fps {fps:.0f}"
            )
        try:
            save_progress_plot(log_dir, log, yv, yp,
                               (grid.img_width, grid.img_height))
            if render_overlays:
                show_pred_ellipses(yv, yp, val_mon.file_list,
                                   num_draw=40, log_dir=log_dir)
        except Exception as e:
            print(f"    (plot/render skipped: {e})")
        if tb is not None:
            for tag, v in (("loss/train", ep_loss),
                           ("loss/val", comps_np["total"]),
                           ("metrics/ring_acc", st.ring_acc),
                           ("metrics/class_acc", st.class_acc),
                           ("metrics/mean_pix_err", st.mean_pix_err),
                           ("perf/img_per_sec", img_per_sec),
                           ("lr", float(state.schedule(state.step)))):
                tb.add_scalar(tag, v, epoch)
            try:  # per-epoch overlay image (reference callbacks.py:239-248)
                from PIL import Image as _Image

                src = os.path.join(log_dir, "steelpan_pred_00000.png")
                if not os.path.exists(src):
                    src = os.path.join(log_dir, "progress.png")
                if os.path.exists(src):
                    arr = np.asarray(_Image.open(src).convert("RGB"))
                    tb.add_image("val/overlay", arr, epoch)
            except Exception as e:
                print(f"    (tb image skipped: {e})")

        if ckpt_dir and ((epoch + 1) % tc.save_every == 0
                         or epoch == tc.epochs - 1):
            # multi-host: the state is fully replicated, so process 0
            # alone writes (concurrent writers on a shared filesystem
            # would race on the same checkpoint path)
            if jax.process_index() == 0:
                save_checkpoint(ckpt_dir, state, cfg)
                if verbose:
                    print(f"    checkpoint saved to {ckpt_dir}")

    return state, model, history
