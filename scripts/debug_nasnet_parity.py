"""Localize the keras-vs-flax NASNet divergence: compare activations at
every cell boundary (concat outputs) between keras.applications
NASNetMobile and spnet_tpu.models.nasnet with imported weights.

CPU only:  PYTHONPATH=/root/repo python scripts/debug_nasnet_parity.py
"""

import numpy as np


def main():
    import keras
    import jax.numpy as jnp
    from flax import linen as nn

    from spnet_tpu.io.keras_import import keras_nasnet_to_flax
    from spnet_tpu.models import nasnet as fnas

    km = keras.applications.NASNetMobile(
        include_top=False, weights=None, input_shape=(96, 96, 3))
    print("concat/activation layers:")
    taps = [l.name for l in km.layers
            if "concat" in l.name or l.name in ("stem_bn1",)]
    print(taps)

    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (2, 96, 96, 3)).astype(np.float32)

    tap_model = keras.Model(
        km.inputs, [km.get_layer(n).output for n in taps])
    kouts = [np.asarray(o) for o in tap_model(x, training=False)]

    bb_p, bb_s = keras_nasnet_to_flax(km)
    fm = fnas.NASNetMobile(dtype=jnp.float32)

    # flax taps: capture via capture_intermediates on cell outputs
    variables = {"params": bb_p, "batch_stats": bb_s}
    y, mods = fm.apply(
        variables, jnp.asarray(x), train=False,
        capture_intermediates=lambda mdl, name: True, mutable=["intermediates"])
    inter = mods["intermediates"]

    def flat(d, prefix=""):
        for k, v in d.items():
            if isinstance(d[k], dict):
                yield from flat(v, prefix + k + "/")
            else:
                yield prefix + k, v

    fouts = {k: v for k, v in flat(inter)}

    # compare cell-by-cell: flax cell order vs keras tap order
    flax_cells = (["stem_red1", "stem_red2"]
                  + [f"normal1_{i}" for i in range(4)] + ["red1"]
                  + [f"normal2_{i}" for i in range(4)] + ["red2"]
                  + [f"normal3_{i}" for i in range(4)])
    # keras taps after stem_bn1 are in graph order; cell concats appear
    # in the same order
    ktap = {n: o for n, o in zip(taps, kouts)}
    print("\nkeras taps in order:", taps)
    for fc in flax_cells:
        key = fc + "/__call__"
        if key not in fouts:
            print(fc, "NOT CAPTURED")
            continue
        fo = np.asarray(fouts[key][0][0])  # (x, ip) tuple -> x
        # find the keras tap with the same shape not yet consumed
        match = None
        for n in taps:
            if n in ktap and np.shape(ktap[n]) == fo.shape:
                match = n
                break
        if match is None:
            print(fc, fo.shape, "no keras tap with this shape")
            continue
        ko = ktap.pop(match)
        err = np.abs(ko - fo).max() / (np.abs(ko).max() + 1e-30)
        cos = float((ko * fo).sum()
                    / (np.linalg.norm(ko) * np.linalg.norm(fo) + 1e-30))
        print(f"{fc:12s} <-> {match:24s} {fo.shape}  "
              f"relmax {err:.4f}  cos {cos:.5f}")


if __name__ == "__main__":
    main()
