"""Compare stem_red1 reduction-cell internals keras-vs-flax."""

import numpy as np


def main():
    import keras
    import jax.numpy as jnp

    from spnet_tpu.io.keras_import import keras_nasnet_to_flax
    from spnet_tpu.models import nasnet as fnas

    km = keras.applications.NASNetMobile(
        include_top=False, weights=None, input_shape=(96, 96, 3))
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (2, 96, 96, 3)).astype(np.float32)

    taps = ["stem_bn1",
            "reduction_bn_1_stem_1",
            "separable_conv_1_bn_reduction_left1_stem_1",
            "separable_conv_2_bn_reduction_left1_stem_1",
            "separable_conv_2_bn_reduction_right1_stem_1",
            "separable_conv_2_bn_reduction_right2_stem_1",
            "separable_conv_2_bn_reduction_right3_stem_1",
            "separable_conv_2_bn_reduction_left4_stem_1",
            "reduction_concat_stem_1"]
    tm = keras.Model(km.inputs, [km.get_layer(n).output for n in taps])
    ko = {n: np.asarray(o) for n, o in zip(taps, tm(x, training=False))}

    bb_p, bb_s = keras_nasnet_to_flax(km)
    fm = fnas.NASNetMobile(dtype=jnp.float32)
    _, mods = fm.apply({"params": bb_p, "batch_stats": bb_s},
                       jnp.asarray(x), train=False,
                       capture_intermediates=lambda m, n: True,
                       mutable=["intermediates"])
    inter = mods["intermediates"]

    cell = inter["stem_red1"]

    def cmp(name, kname, fval):
        k = ko[kname]
        f = np.asarray(fval)
        if k.shape != f.shape:
            print(f"{name}: SHAPE {k.shape} vs {f.shape}")
            return
        err = np.abs(k - f).max() / (np.abs(k).max() + 1e-30)
        cos = float((k * f).sum()
                    / (np.linalg.norm(k) * np.linalg.norm(f) + 1e-30))
        print(f"{name:10s} {f.shape}  relmax {err:.5f}  cos {cos:.6f}")

    # h after conv1+bn1 is not a module boundary; capture via bn1 module
    cmp("h(bn1)", "reduction_bn_1_stem_1",
        cell["bn1"]["__call__"][0])
    for slot, kslot in (("left1", "left1"), ("right1", "right1"),
                        ("right2", "right2"), ("right3", "right3"),
                        ("left5", "left4")):
        cmp(slot, f"separable_conv_2_bn_reduction_{kslot}_stem_1",
            cell[slot]["__call__"][0])
    # also the first sep stage of left1
    k = ko["separable_conv_1_bn_reduction_left1_stem_1"]
    f = np.asarray(cell["left1"]["bn1"]["__call__"][0])
    err = np.abs(k - f).max() / (np.abs(k).max() + 1e-30)
    print(f"left1.sep1 {f.shape}  relmax {err:.5f}")
    cmp("concat", "reduction_concat_stem_1",
        cell["__call__"][0][0])


if __name__ == "__main__":
    main()
