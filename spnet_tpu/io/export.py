"""AOT serving export: a trained checkpoint -> one self-contained
StableHLO artifact.

Beyond the reference (which serves by reloading Keras weights into a
Python process, `/root/reference/predict_spnet.py:40-52`): `jax.export`
serializes the jitted inference function — weights baked in as
constants, normalization fused — to portable StableHLO bytes that any
jax runtime (TPU/CPU/GPU, current or newer jaxlib) can deserialize and
call without spnet_tpu, flax, or the checkpoint present.  This is the
TPU-native deployment contract: compile once, ship the artifact.

Artifact layout (one directory):
  predictor.stablehlo   serialized export (uint8 NHWC frames in,
                        normalized (B, num_outputs) grid out)
  meta.json             ExperimentConfig JSON + input contract, so a
                        server can size inputs and denormalize outputs
                        (spnet_tpu.grid.denormalize with the GridSpec).

The batch dimension is exported symbolically when the platform
supports it, else at a fixed size recorded in meta.json.
"""

from __future__ import annotations

import json
import os

import numpy as np


def export_predictor(ckpt_dir: str, out_dir: str,
                     batch_size: int | None = None,
                     platforms: tuple[str, ...] | None = None) -> str:
    """Export the checkpoint's inference function; returns out_dir.

    batch_size None -> symbolic batch ("b"); an int pins it (and is
    also the fallback if symbolic tracing fails on the model).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from spnet_tpu.cli.common import load_model_and_state

    cfg, model, state = load_model_and_state(ckpt_dir)
    size = cfg.model.input_size or None
    h = size or cfg.grid.img_height
    w = size or cfg.grid.img_width
    params = jax.device_get(state.params)
    batch_stats = jax.device_get(state.batch_stats)

    def predict(x):
        # uint8 frames in; the Inception normalization is fused into
        # the artifact (same contract as train/steps._prep_x)
        xf = (x.astype(jnp.float32) / 255.0 - 0.5) * 2.0
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, xf,
            train=False)

    fn = jax.jit(predict)
    kwargs = {}
    if platforms:
        kwargs["platforms"] = list(platforms)
    exp = None
    sym_batch = False
    if batch_size is None:
        try:
            (b,) = jexport.symbolic_shape("b")
            exp = jexport.export(fn, **kwargs)(
                jax.ShapeDtypeStruct((b, h, w, 1), jnp.uint8))
            sym_batch = True
        except Exception as e:  # fall back to a fixed batch
            print(f"    (symbolic batch unsupported here: {e}; "
                  f"exporting fixed batch)")
            batch_size = 64
    if exp is None:
        exp = jexport.export(fn, **kwargs)(
            jax.ShapeDtypeStruct((batch_size, h, w, 1), jnp.uint8))

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "predictor.stablehlo"), "wb") as f:
        f.write(exp.serialize())
    meta = {
        "config": json.loads(cfg.to_json()),
        "input": {"height": h, "width": w, "channels": 1,
                  "dtype": "uint8",
                  "batch": "symbolic" if sym_batch else batch_size},
        "output": "normalized flat grid (B, num_outputs); denormalize "
                  "with spnet_tpu.grid.denormalize(GridSpec)",
        "platforms": list(platforms) if platforms else None,
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


def load_predictor(artifact_dir: str):
    """Deserialize an exported artifact; returns (call, meta) where
    call(uint8 NHWC array) -> normalized predictions.  Needs only jax —
    no flax, no model code, no checkpoint."""
    from jax import export as jexport

    with open(os.path.join(artifact_dir, "predictor.stablehlo"),
              "rb") as f:
        exp = jexport.deserialize(f.read())
    with open(os.path.join(artifact_dir, "meta.json")) as f:
        meta = json.load(f)

    def call(x):
        return exp.call(np.asarray(x, np.uint8))

    return call, meta
