"""End-to-end slice: synthetic data -> train -> evaluate -> predict ->
checkpoint/resume, on a tiny CPU-runnable config.  This mirrors how the
reference validates itself — training on generated data with known labels
(SURVEY.md §4)."""

import dataclasses
import json
import os

import numpy as np
import pytest

from spnet_tpu.config import (
    ExperimentConfig,
    GridSpec,
    ModelConfig,
    TrainConfig,
)
from spnet_tpu.data.dataset import build_dataset, synthetic_dataset
from spnet_tpu.data.synth import generate_dataset
from spnet_tpu.eval.evaluate import evaluate_network
from spnet_tpu.eval.predict import predict_network
from spnet_tpu.io.checkpoint import load_checkpoint, restore_if_exists
from spnet_tpu.train.loop import train_network


def _tiny_cfg():
    return ExperimentConfig(
        grid=GridSpec(),
        model=ModelConfig(backbone="MobileNetTiny", input_size=96,
                          compute_dtype="float32"),
        train=TrainConfig(batch_size=8, epochs=3, lr_max=2e-3,
                          augment=False, save_every=2, seed=0),
    )


@pytest.mark.slow
def test_end_to_end(tmp_path):
    cfg = _tiny_cfg()
    data_dir = str(tmp_path / "data")
    generate_dataset(data_dir, 24, seed=11, train_only=False, batch=8,
                     verbose=False)
    # 80/20: Train has ~19, Val ~5 -> rebalance by just using Train twice
    train_ds = build_dataset(
        os.path.join(data_dir, "Train"), cfg.grid, batch_size=8,
        input_size=cfg.model.input_size, seed=0,
    )
    val_ds = build_dataset(
        os.path.join(data_dir, "Val"), cfg.grid, batch_size=None,
        shuffle=False, input_size=cfg.model.input_size,
    )

    log_dir = str(tmp_path / "logs")
    ckpt_dir = str(tmp_path / "ckpt")
    state, model, history = train_network(
        cfg, train_ds, val_ds, log_dir=log_dir, ckpt_dir=ckpt_dir,
        data_parallel=True, render_overlays=True, verbose=0,
    )
    assert len(history) == 3
    assert history[-1]["train_loss"] < history[0]["train_loss"]
    assert os.path.exists(os.path.join(log_dir, "losses.dat"))
    assert os.path.exists(os.path.join(log_dir, "progress.png"))
    assert os.path.exists(os.path.join(log_dir, "steelpan_pred_00000.png"))

    # checkpoint written + config round-trips with the grid spec
    payload, cfg2 = load_checkpoint(ckpt_dir)
    assert cfg2.grid == cfg.grid
    assert int(np.asarray(payload["step"])) == int(state.step)

    # evaluate
    res = evaluate_network(cfg, state, model, val_ds,
                           log_dir=str(tmp_path / "eval") + os.sep,
                           num_draw=3, verbose=0)
    assert 0.0 <= res["mAP"] <= 1.0
    assert np.isfinite(res["mean_pix_err"])
    assert os.path.exists(str(tmp_path / "eval") + os.sep +
                          "hawley_spnet.csv")

    # predict (label-free)
    yp, files = predict_network(
        cfg, state, model, os.path.join(data_dir, "Val"),
        log_dir=str(tmp_path / "pred") + os.sep, batch_size=4, num_draw=2,
        verbose=0,
    )
    assert yp.shape[1] == cfg.grid.num_outputs

    # resume: fresh state picks up the checkpointed step
    from spnet_tpu.models.spnet import build_model
    from spnet_tpu.train.schedule import onecycle_schedule
    from spnet_tpu.train.state import create_train_state
    import jax
    import jax.numpy as jnp

    model2 = build_model(cfg.model, num_outputs=cfg.grid.num_outputs)
    fresh = create_train_state(
        model2, jax.random.key(0),
        jnp.zeros((2, 96, 96, 1)), onecycle_schedule(1e-3, 10),
    )
    resumed = restore_if_exists(ckpt_dir, fresh)
    assert int(resumed.step) == int(state.step)
    np.testing.assert_allclose(
        np.asarray(resumed.params["final_output"]["kernel"]),
        np.asarray(state.params["final_output"]["kernel"]),
    )


@pytest.mark.slow
def test_synthetic_inmemory_dataset():
    cfg = _tiny_cfg()
    ds = synthetic_dataset(16, cfg.grid, seed=3, input_size=64,
                           batch_size=8)
    assert ds.x.shape == (16, 64, 64, 1)
    assert ds.x.dtype == np.uint8  # device-memory-friendly storage
    assert ds.y.shape == (16, cfg.grid.num_outputs)
    assert np.isfinite(ds.y).all()

    ds32 = synthetic_dataset(8, cfg.grid, seed=3, input_size=64,
                             uint8=False)
    assert ds32.x.dtype == np.float32
    assert -1.01 <= ds32.x.min() and ds32.x.max() <= 1.01


def test_checkpoint_restores_optimizer_state(tmp_path):
    """Resume must carry the Adam moments: a weights-only resume
    mid-anneal measurably destabilizes training (io/checkpoint.py
    docstring).  Save after one real step, restore into a FRESH state,
    and require bit-equal opt_state leaves."""
    import jax
    import jax.numpy as jnp

    from spnet_tpu.config import LossWeights
    from spnet_tpu.io.checkpoint import restore_if_exists, \
        save_checkpoint
    from spnet_tpu.models.spnet import build_model
    from spnet_tpu.train.schedule import onecycle_schedule
    from spnet_tpu.train.state import create_train_state
    from spnet_tpu.train.steps import make_train_step

    cfg = _tiny_cfg()
    model = build_model(cfg.model, num_outputs=cfg.grid.num_outputs)
    sched = onecycle_schedule(1e-3, 100)
    sample = jnp.zeros((4, 96, 96, 1))
    state = create_train_state(model, jax.random.key(0), sample, sched)
    step = make_train_step(model, LossWeights(), "same", augment=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (4, 96, 96, 1)).astype(np.float32))
    y = jnp.asarray(rng.normal(0, 0.1,
                               (4, cfg.grid.num_outputs))
                    .astype(np.float32))
    state, _ = step(state, x, y, jax.random.key(1))
    save_checkpoint(str(tmp_path / "ck"), state, cfg)

    fresh = create_train_state(model, jax.random.key(9), sample, sched)
    restored = restore_if_exists(str(tmp_path / "ck"), fresh)
    a = jax.tree_util.tree_leaves(state.opt_state)
    b = jax.tree_util.tree_leaves(restored.opt_state)
    assert len(a) == len(b)
    nonzero = 0
    for la, lb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        nonzero += bool(np.any(np.asarray(la) != 0))
    assert nonzero  # the moments are real data, not all-zero trees


def test_checkpoint_opt_state_shape_mismatch_falls_back(tmp_path):
    """A checkpoint whose optimizer leaves match in COUNT but not in
    shape (e.g. a different head geometry) must resume weights-only,
    not unflatten moments into the wrong slots (ADVICE r3)."""
    import jax
    import jax.numpy as jnp

    from spnet_tpu.config import LossWeights
    from spnet_tpu.io.checkpoint import restore_if_exists, \
        save_checkpoint
    from spnet_tpu.models.spnet import build_model
    from spnet_tpu.train.schedule import onecycle_schedule
    from spnet_tpu.train.state import create_train_state
    from spnet_tpu.train.steps import make_train_step

    cfg = _tiny_cfg()
    model = build_model(cfg.model, num_outputs=cfg.grid.num_outputs)
    sched = onecycle_schedule(1e-3, 100)
    state = create_train_state(model, jax.random.key(0),
                               jnp.zeros((4, 96, 96, 1)), sched)
    step = make_train_step(model, LossWeights(), "same", augment=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (4, 96, 96, 1)).astype(np.float32))
    y = jnp.asarray(rng.normal(0, 0.1, (4, cfg.grid.num_outputs))
                    .astype(np.float32))
    state, _ = step(state, x, y, jax.random.key(1))
    save_checkpoint(str(tmp_path / "ck"), state, cfg)

    # same tree structure / leaf count, different Dense-head shapes
    fresh = create_train_state(model, jax.random.key(9),
                               jnp.zeros((4, 64, 64, 1)), sched)
    restored = restore_if_exists(str(tmp_path / "ck"), fresh)
    for la, lb in zip(jax.tree_util.tree_leaves(fresh.opt_state),
                      jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_stem_fused_infer_batch_clamp():
    """stem_fused kernel-faults the TPU worker at b=512 eval (NOTES.md
    round-3); every predict path clamps through ModelConfig."""
    from spnet_tpu.config import ModelConfig

    assert ModelConfig(stem_fused=True).clamp_infer_batch(512) == 256
    assert ModelConfig(stem_fused=True).clamp_infer_batch(128) == 128
    assert ModelConfig().clamp_infer_batch(512) == 512


def test_eval_predictions_batch_size_independent():
    """The in-train val sweep and evaluate_network predict in LARGE
    batches rather than the train batch — valid only because eval-mode
    predictions are batch-size independent (BN running stats, no
    dropout).  Pin that."""
    import jax
    import jax.numpy as jnp

    from spnet_tpu.models.spnet import build_model
    from spnet_tpu.train.loop import predict_in_batches
    from spnet_tpu.train.steps import make_predict_step

    cfg = _tiny_cfg()
    model = build_model(cfg.model, num_outputs=cfg.grid.num_outputs)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (12, 96, 96, 1), np.uint8)
    v = model.init(jax.random.key(0), jnp.zeros((2, 96, 96, 1)),
                   train=False)
    predict_fn = make_predict_step(model)
    y4, _ = predict_in_batches(predict_fn, v["params"],
                               v["batch_stats"], x, 4, verbose=False)
    y12, _ = predict_in_batches(predict_fn, v["params"],
                                v["batch_stats"], x, 12, verbose=False)
    # also exercises the final-partial-batch padding path
    y5, _ = predict_in_batches(predict_fn, v["params"],
                               v["batch_stats"], x, 5, verbose=False)
    np.testing.assert_allclose(y4, y12, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(y5, y12, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_checkpoint_inference_roundtrip(tmp_path):
    """Checkpoint -> load_model_and_state -> evaluate (the evaluate/
    predict CLI path, which reconstructs everything from the checkpoint
    alone — no hidden normalization state)."""
    from spnet_tpu.cli.common import load_model_and_state
    from spnet_tpu.io.checkpoint import save_checkpoint
    from spnet_tpu.models.spnet import build_model
    from spnet_tpu.train.schedule import onecycle_schedule
    from spnet_tpu.train.state import create_train_state
    import jax
    import jax.numpy as jnp

    cfg = _tiny_cfg()
    model = build_model(cfg.model, num_outputs=cfg.grid.num_outputs)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((2, 96, 96, 1)),
        onecycle_schedule(1e-3, 10),
    )
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, state, cfg)

    cfg2, model2, inf_state = load_model_and_state(ckpt)
    assert cfg2.grid == cfg.grid
    ds = synthetic_dataset(8, cfg.grid, seed=5, input_size=96)
    res = evaluate_network(cfg2, inf_state, model2, ds,
                           log_dir=str(tmp_path / "ev") + os.sep,
                           num_draw=0, compute_map=False, verbose=0)
    assert np.isfinite(res["mean_pix_err"])


@pytest.mark.slow
def test_big_mode_native_resolution(tmp_path):
    """The reference's 'big' model_type: no resize, native 512x384 input
    (`/root/reference/spnet/config.py:47`).  The model is shape-generic;
    input_size=0 in the config plumbs size=None through the loaders."""
    cfg = ExperimentConfig(
        grid=GridSpec(),
        model=ModelConfig(backbone="MobileNetTiny", input_size=0,
                          compute_dtype="float32"),
        train=TrainConfig(batch_size=2, epochs=1, lr_max=1e-3,
                          augment=False, seed=0),
    )
    data_dir = str(tmp_path / "d")
    generate_dataset(data_dir, 4, seed=21, batch=4, verbose=False)
    ds = build_dataset(os.path.join(data_dir, "Train"), cfg.grid,
                       batch_size=2, input_size=None, seed=0)
    assert ds.x.shape[1:] == (384, 512, 1)
    state, model, hist = train_network(
        cfg, ds, ds, log_dir=str(tmp_path / "logs"), ckpt_dir=None,
        render_overlays=False, verbose=0,
    )
    assert np.isfinite(hist[-1]["train_loss"])


@pytest.mark.slow
def test_hybrid_loss_end_to_end(tmp_path):
    """loss_type='hybrid': BCE-with-logits existence — the eval path must
    sigmoid-decode noobj before denormalizing (reference
    `evaluate_spnet.py:70-71`)."""
    cfg = ExperimentConfig(
        grid=GridSpec(),
        model=ModelConfig(backbone="MobileNetTiny", input_size=64,
                          loss_type="hybrid", compute_dtype="float32"),
        train=TrainConfig(batch_size=8, epochs=2, lr_max=1e-3,
                          augment=False, seed=0),
    )
    train_ds = synthetic_dataset(32, cfg.grid, seed=1, input_size=64,
                                 batch_size=8)
    val_ds = synthetic_dataset(16, cfg.grid, seed=2, input_size=64)
    state, model, hist = train_network(
        cfg, train_ds, val_ds, log_dir=str(tmp_path / "logs"),
        ckpt_dir=None, render_overlays=False, verbose=0,
    )
    assert np.isfinite(hist[-1]["train_loss"])
    res = evaluate_network(cfg, state, model, val_ds,
                           log_dir=str(tmp_path / "ev") + os.sep,
                           num_draw=0, compute_map=False, verbose=0)
    assert np.isfinite(res["mean_pix_err"])


@pytest.mark.slow
def test_val_monitoring_slice_under_hbm_budget(tmp_path, monkeypatch,
                                               capsys):
    """HBM headroom guard: when train+val residency exceeds the budget
    (round-5 native-res OOM: epoch-program temporaries ~7.6 GiB on top
    of residents, 'Used 16.02G of 15.75G hbm'), the loop keeps only a
    leading val slice device-resident for per-epoch monitoring; the
    final evaluation still scores the full val set."""
    cfg = ExperimentConfig(
        grid=GridSpec(),
        model=ModelConfig(backbone="MobileNetTiny", input_size=64,
                          compute_dtype="float32"),
        train=TrainConfig(batch_size=8, epochs=1, lr_max=1e-3,
                          augment=False, seed=0),
    )
    train_ds = synthetic_dataset(32, cfg.grid, seed=1, input_size=64,
                                 batch_size=8)
    val_ds = synthetic_dataset(320, cfg.grid, seed=2, input_size=64)
    # per-device budget; the test env auto-builds an 8-device CPU mesh
    # (batch 8 divides 8 devices), so the effective budget is 8× this —
    # chosen so train + full val exceeds it but the guard's 256-frame
    # floor fits and divides the mesh
    monkeypatch.setenv("SPNET_RESIDENT_BUDGET", "1.5e5")
    state, model, hist = train_network(
        cfg, train_ds, val_ds, log_dir=str(tmp_path / "logs"),
        ckpt_dir=None, render_overlays=False, device_data=True,
        verbose=1,
    )
    out = capsys.readouterr().out
    assert "val monitoring slice: 256/320" in out
    assert np.isfinite(hist[-1]["train_loss"])
    assert np.isfinite(hist[-1]["ring_acc"])
    res = evaluate_network(cfg, state, model, val_ds,
                           log_dir=str(tmp_path / "ev") + os.sep,
                           num_draw=0, compute_map=False, verbose=0)
    assert np.isfinite(res["mean_pix_err"])


@pytest.mark.slow
def test_frozen_phase_then_unfreeze(tmp_path):
    """freeze_fac + frozen_epochs: early epochs train with the first
    backbone fraction frozen, then the loop swaps to a fully-trainable
    optimizer (reference `train_spnet.py:74-78`)."""
    cfg = ExperimentConfig(
        grid=GridSpec(),
        model=ModelConfig(backbone="MobileNetTiny", input_size=64,
                          compute_dtype="float32"),
        train=TrainConfig(batch_size=8, epochs=3, lr_max=1e-3,
                          augment=False, seed=0, freeze_fac=0.5,
                          frozen_epochs=1),
    )
    train_ds = synthetic_dataset(16, cfg.grid, seed=1, input_size=64,
                                 batch_size=8)
    state, model, hist = train_network(
        cfg, train_ds, train_ds, log_dir=str(tmp_path / "logs"),
        ckpt_dir=None, render_overlays=False, verbose=0,
    )
    assert len(hist) == 3
    assert int(state.step) == 3 * (16 // 8)
    assert np.isfinite(hist[-1]["train_loss"])


@pytest.mark.slow
def test_resume_continues_at_epoch(tmp_path):
    """Elastic recovery: restarting the same run continues from the
    checkpointed epoch instead of re-running from scratch."""
    cfg = dataclasses.replace(
        _tiny_cfg(),
        train=TrainConfig(batch_size=8, epochs=4, lr_max=1e-3,
                          augment=False, save_every=2, seed=0),
    )
    ds = synthetic_dataset(16, cfg.grid, seed=1, input_size=96,
                           batch_size=8)
    ckpt = str(tmp_path / "ck")
    # phase 1: run 2 of 4 epochs (save_every=2 -> checkpoint at epoch 2)
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, epochs=2))
    state1, _, h1 = train_network(cfg2, ds, ds,
                                  log_dir=str(tmp_path / "l1"),
                                  ckpt_dir=ckpt, render_overlays=False,
                                  verbose=0)
    assert int(state1.step) == 2 * 2  # 2 epochs x 2 steps

    # phase 2: same run config asks for 4 epochs; resumes at epoch 3
    state2, _, h2 = train_network(cfg, ds, ds,
                                  log_dir=str(tmp_path / "l2"),
                                  ckpt_dir=ckpt, render_overlays=False,
                                  verbose=0)
    assert len(h2) == 2  # only epochs 3 and 4 ran
    assert int(state2.step) == 4 * 2


@pytest.mark.slow
def test_resume_mid_frozen_phase_unfreezes_on_schedule(tmp_path):
    """Resuming inside the frozen phase must count the completed frozen
    epochs (frozen_left = frozen_epochs - start_epoch, not the full
    frozen_epochs): with frozen_epochs=2, a run interrupted after epoch 1
    and resumed for epochs 2-3 must unfreeze after epoch 2, so the frozen
    backbone params MUST have trained by the end of epoch 3."""

    def cfg_for(epochs):
        return ExperimentConfig(
            grid=GridSpec(),
            model=ModelConfig(backbone="MobileNetTiny", input_size=64,
                              compute_dtype="float32"),
            train=TrainConfig(batch_size=8, epochs=epochs, lr_max=1e-3,
                              augment=False, save_every=1, seed=0,
                              freeze_fac=0.5, frozen_epochs=2),
        )

    ds = synthetic_dataset(16, GridSpec(), seed=1, input_size=64,
                           batch_size=8)

    # interrupted: 1 epoch (mid-frozen-phase checkpoint) ...
    ck = str(tmp_path / "ck")
    train_network(cfg_for(1), ds, ds, log_dir=str(tmp_path / "l1"),
                  ckpt_dir=ck, render_overlays=False, verbose=0)
    payload, _ = load_checkpoint(ck)
    frozen_kernel_before = np.asarray(
        payload["params"]["backbone"]["conv1"]["conv"]["kernel"])

    # ... then resume for epochs 2-3 (one more frozen epoch, then train)
    state, _, _ = train_network(
        cfg_for(3), ds, ds, log_dir=str(tmp_path / "l2"),
        ckpt_dir=ck, render_overlays=False, verbose=0)
    assert int(state.step) == 3 * 2
    frozen_kernel_after = np.asarray(
        state.params["backbone"]["conv1"]["conv"]["kernel"])
    # the buggy behavior (frozen_left reset to the full frozen_epochs)
    # keeps the backbone frozen through epochs 2 AND 3 -> identical kernel
    assert not np.allclose(frozen_kernel_before, frozen_kernel_after), \
        "backbone never unfroze after mid-frozen-phase resume"


def test_multihost_shard_partition(tmp_path):
    """shard_index/num_shards must partition the dataset exactly: same
    deterministic global shuffle on every host, disjoint strided slices,
    union = whole dataset."""
    data_dir = str(tmp_path / "d")
    generate_dataset(data_dir, 12, seed=3, batch=12, verbose=False)
    full = build_dataset(os.path.join(data_dir, "Train"), GridSpec(),
                         input_size=64, seed=7)
    shards = [
        build_dataset(os.path.join(data_dir, "Train"), GridSpec(),
                      input_size=64, seed=7, shard_index=i, num_shards=3)
        for i in range(3)
    ]
    seen = [f for s in shards for f in s.file_list]
    assert sorted(seen) == sorted(full.file_list)
    assert len(set(seen)) == len(seen)  # disjoint
    # same global order -> shard 0 holds every 3rd file of the full list
    assert shards[0].file_list == full.file_list[0::3]


@pytest.mark.slow
def test_geo_augment_trains(tmp_path):
    """Train-time geometric augmentation (on-device flip/rotate/translate
    + label re-encode) runs through both the whole-epoch-scan and the
    host-fed paths and the loss decreases."""
    from spnet_tpu.data.dataset import synthetic_dataset

    cfg = _tiny_cfg()
    cfg = ExperimentConfig(
        grid=cfg.grid, model=cfg.model,
        train=TrainConfig(batch_size=8, epochs=3, lr_max=2e-3,
                          augment=True, geo_augment=True, save_every=99,
                          seed=0),
    )
    train_ds = synthetic_dataset(32, cfg.grid, seed=3,
                                 input_size=cfg.model.input_size,
                                 batch_size=8)
    val_ds = synthetic_dataset(8, cfg.grid, seed=901,
                               input_size=cfg.model.input_size)
    assert train_ds.rows is not None and train_ds.row_mask is not None

    # device-resident whole-epoch-scan path
    state, model, hist = train_network(
        cfg, train_ds, val_ds, log_dir=str(tmp_path / "geo_dev"),
        ckpt_dir=None, render_overlays=False, device_data=True, verbose=0,
    )
    assert len(hist) == 3
    assert np.isfinite(hist[-1]["train_loss"])
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]

    # host-fed per-step path
    state, model, hist = train_network(
        cfg, train_ds, val_ds, log_dir=str(tmp_path / "geo_host"),
        ckpt_dir=None, render_overlays=False, device_data=False,
        verbose=0,
    )
    assert len(hist) == 3
    assert np.isfinite(hist[-1]["train_loss"])


@pytest.mark.slow
def test_chunked_streaming_trains(tmp_path, monkeypatch):
    """>HBM path: chunk-streamed device training (fixed-size HBM shards,
    one-chunk-ahead prefetch) runs a full multi-epoch train and learns.
    The chunk planner is pinned small so a tiny dataset exercises 4
    chunks."""
    import spnet_tpu.train.chunked as chunked
    from spnet_tpu.data.dataset import synthetic_dataset

    monkeypatch.setattr(
        chunked, "plan_chunks",
        lambda n, item_bytes, bs, budget: (bs * 2, n // (bs * 2)),
    )
    cfg = _tiny_cfg()
    train_ds = synthetic_dataset(64, cfg.grid, seed=5,
                                 input_size=cfg.model.input_size,
                                 batch_size=8)
    val_ds = synthetic_dataset(8, cfg.grid, seed=902,
                               input_size=cfg.model.input_size)
    state, model, hist = train_network(
        cfg, train_ds, val_ds, log_dir=str(tmp_path / "chunked"),
        ckpt_dir=None, render_overlays=False, device_data="chunked",
        verbose=1,
    )
    assert len(hist) == 3
    assert np.isfinite(hist[-1]["train_loss"])
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    # every chunk contributes: 64 frames / (8*2) = 4 chunks * 2 steps
    assert hist[-1]["img_per_sec"] > 0


def test_epoch_repeats(tmp_path):
    """TrainConfig.epoch_repeats=R runs R shuffled passes per epoch
    program / per val sweep (the Dataset-D tiny-set protocol: equal
    images-seen with 1/R the val-sweep overhead).  Step accounting,
    history length, and the 1-cycle schedule must all see R*n//b steps
    per epoch, on both the resident and host-streaming paths."""
    cfg = ExperimentConfig(
        grid=GridSpec(),
        model=ModelConfig(backbone="MobileNetTiny", input_size=64,
                          compute_dtype="float32"),
        train=TrainConfig(batch_size=8, epochs=2, lr_max=1e-3,
                          augment=True, geo_augment=True, seed=0,
                          epoch_repeats=3),
    )
    train_ds = synthetic_dataset(16, cfg.grid, seed=1, input_size=64,
                                 batch_size=8)
    val_ds = synthetic_dataset(8, cfg.grid, seed=2, input_size=64)
    for device_data in (True, False):
        state, model, hist = train_network(
            cfg, train_ds, val_ds, log_dir=str(tmp_path / "logs"),
            ckpt_dir=None, render_overlays=False, verbose=0,
            device_data=device_data,
        )
        # 2 epochs x 3 passes x (16//8) steps
        assert int(state.step) == 12, (device_data, int(state.step))
        assert len(hist) == 2
        assert np.isfinite(hist[-1]["train_loss"])
