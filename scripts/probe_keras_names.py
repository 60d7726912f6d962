"""Probe the installed keras.applications layer naming for
InceptionResNetV2 / NASNetMobile — verifies the assumptions behind
`spnet_tpu/io/keras_import.py`'s mappers against THIS keras version
(layer census, auto-name ordering, cell block-ids).

Run on CPU (no TPU contention):  python scripts/probe_keras_names.py irv2|nasnet
"""

import sys

import numpy as np


def probe_irv2():
    import keras

    m = keras.applications.InceptionResNetV2(
        include_top=False, weights=None, input_shape=(96, 96, 3))
    from spnet_tpu.io.keras_import import _auto_named, _irv2_convbn_paths

    convs = _auto_named(m, "Conv2D", "conv2d")
    bns = _auto_named(m, "BatchNormalization", "batch_normalization")
    paths = _irv2_convbn_paths()
    print(f"auto convs={len(convs)} auto bns={len(bns)} "
          f"expected paths={len(paths)}")
    named = [l.name for l in m.layers
             if l.__class__.__name__ == "Conv2D"
             and not l.name.startswith("conv2d")]
    print(f"named convs ({len(named)}):", named[:6], "...", named[-3:])
    # spot-print shapes at the block boundaries for cross-checking
    for i in (0, 4, 5, 11, 12, 17, 71, 72, 75, 76, 155, 156, 162, 163, 202):
        if i < len(convs):
            w = convs[i].get_weights()[0]
            print(f"  conv[{i:3d}] {convs[i].name:24s} {np.shape(w)}  "
                  f"-> {paths[i] if i < len(paths) else '??'}")
    for l in m.layers:
        if l.__class__.__name__ == "BatchNormalization":
            print("BN weight count:", len(l.get_weights()), l.name)
            break


def probe_nasnet():
    import keras

    m = keras.applications.NASNetMobile(
        include_top=False, weights=None, input_shape=(224, 224, 3))
    names = [l.name for l in m.layers
             if l.__class__.__name__ in
             ("Conv2D", "SeparableConv2D", "BatchNormalization")]
    print(f"{len(names)} conv/sep/bn layers")
    for n in names:
        print(" ", n)


if __name__ == "__main__":
    {"irv2": probe_irv2, "nasnet": probe_nasnet}[sys.argv[1]]()
