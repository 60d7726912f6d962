from spnet_tpu.models.spnet import SPNet, build_model

__all__ = ["SPNet", "build_model"]
