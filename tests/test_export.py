"""Serving export (io/export.py): checkpoint -> StableHLO artifact ->
deserialize WITHOUT model code -> numerical parity with model.apply.
"""

import numpy as np
import pytest

from spnet_tpu.config import (
    ExperimentConfig,
    GridSpec,
    ModelConfig,
    TrainConfig,
)
from spnet_tpu.io.checkpoint import save_checkpoint
from spnet_tpu.io.export import export_predictor, load_predictor


@pytest.mark.slow
def test_export_round_trip(tmp_path):
    import jax
    import jax.numpy as jnp

    from spnet_tpu.models.spnet import build_model
    from spnet_tpu.train.schedule import onecycle_schedule
    from spnet_tpu.train.state import create_train_state

    grid = GridSpec()
    cfg = ExperimentConfig(
        grid=grid,
        model=ModelConfig(backbone="MobileNetTiny", input_size=64,
                          compute_dtype="float32"),
        train=TrainConfig(batch_size=4, epochs=1),
    )
    model = build_model(cfg.model, num_outputs=grid.num_outputs)
    state = create_train_state(
        model, jax.random.key(3), jnp.zeros((4, 64, 64, 1)),
        onecycle_schedule(1e-3, 10))
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, state, cfg)

    art = export_predictor(ckpt, str(tmp_path / "art"))
    call, meta = load_predictor(art)
    assert meta["input"]["height"] == 64
    assert meta["input"]["dtype"] == "uint8"

    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (4, 64, 64, 1), np.uint8)
    got = np.asarray(call(x))

    xf = (x.astype(np.float32) / 255.0 - 0.5) * 2.0
    want = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(xf), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # symbolic batch: a different batch size runs through the SAME
    # artifact (skip silently if this export fell back to fixed batch)
    if meta["input"]["batch"] == "symbolic":
        x2 = rng.integers(0, 256, (7, 64, 64, 1), np.uint8)
        got2 = np.asarray(call(x2))
        assert got2.shape == (7, grid.num_outputs)
