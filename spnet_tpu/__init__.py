"""spnet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for YOLO-style
detection of rotated ellipses + per-ellipse ring-count regression in ESPI
images of steelpan drums.

Capability reference: drscotthawley/SPNet (see SURVEY.md).  This is a
from-scratch TPU-first design, not a port: the compute path is functional
JAX compiled by XLA, custom ops are Pallas TPU kernels, scaling is done
with `jax.sharding` over a device mesh, and all label/grid state is
explicit and serializable (no hidden module globals).
"""

from spnet_tpu.config import (
    GridSpec,
    LossWeights,
    ModelConfig,
    TrainConfig,
    IND_CX,
    IND_CY,
    IND_A,
    IND_B,
    IND_ANGLE1,
    IND_ANGLE2,
    IND_NOOBJ,
    IND_RINGS,
    VARS_PER_PRED,
)

__version__ = "0.1.0"
