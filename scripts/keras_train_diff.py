#!/usr/bin/env python3
"""Step-level trainer differential: spnet_tpu vs tf.keras.

The round-4 accuracy campaign eliminated data (refgen run), recipe,
init, eps, blur, resize and dtype plumbing as causes of the residual
~1-pt ring-acc gap, leaving "a still-unknown Keras-vs-flax training
difference" (VALIDATION.md §2a) and matmul precision as the live
suspects.  This experiment attacks the first directly: build the SAME
model (stem + MobileNet + Dense head, reference `models.py:302-388`
shape) in tf.keras and in spnet_tpu, copy the keras init into the flax
tree (reusing io/keras_import), feed IDENTICAL f32 batches with
dropout/augmentation off, and compare

  1. the first optimizer step exactly: per-layer parameter deltas and
     BN moving-stat updates (deterministic — any real semantic
     difference in loss, L2, BN-train behavior or Adam shows here), and
  2. the loss trajectory over N steps (chaotic drift is expected from
     f32 reduction-order differences; what matters is that there is no
     systematic divergence).

Known candidate difference probed by (1): Keras's Adam applies eps to
the UNCORRECTED sqrt(v) with the bias correction folded into lr_t
(effective eps_t = eps/sqrt(1-beta2^t), ~30x larger at step 1) while
optax.adam adds eps to the corrected sqrt(v_hat).

Runs on CPU only (does not claim the TPU).
Usage: python scripts/keras_train_diff.py [steps] [batch] [n_frames]
SPNET_ADAM=keras switches the flax side to train/optim.keras_adam (the
discriminating A/B for the Adam-semantics hypothesis).
Prints KERAS_DIFF_RESULT json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def build_keras_twin(input_size, seed):
    """tf.keras model mirroring spnet_tpu's SPNet(MobileNet) exactly:
    same layer shapes, same init family (glorot_uniform), BN eps 1e-3 /
    momentum 0.99, LeakyReLU(0.1), no dropout, L2 1e-4 on the
    'reference' scope (stem convs + backbone conv1/conv2/block2 +
    final dense — train/steps.py:_l2_in_scope)."""
    import tensorflow as tf

    tf.keras.utils.set_random_seed(seed)
    L = tf.keras.layers

    inp = L.Input((input_size, input_size, 1))
    x = L.Conv2D(3, (3, 3), padding="same", use_bias=False,
                 name="colorizer")(inp)
    x = L.AveragePooling2D((2, 2))(x)
    x = L.BatchNormalization(momentum=0.99, epsilon=1e-3, name="bn1")(x)
    x = L.LeakyReLU(0.1)(x)
    x = L.Conv2D(3, (3, 3), padding="same", use_bias=False,
                 name="conv2")(x)
    x = L.BatchNormalization(momentum=0.99, epsilon=1e-3, name="bn2")(x)
    x = L.LeakyReLU(0.1)(x)
    x = L.Conv2D(3, (3, 3), padding="same", use_bias=False,
                 name="conv3")(x)
    x = L.BatchNormalization(momentum=0.99, epsilon=1e-3, name="bn3")(x)
    skip = L.AveragePooling2D((2, 2))(inp)
    x = L.Lambda(lambda t: t[0] + t[1])([x, skip])  # 1ch skip broadcast

    half = input_size // 2
    backbone = tf.keras.applications.MobileNet(
        include_top=False, weights=None, input_shape=(half, half, 3))
    x = backbone(x)
    x = L.Flatten()(x)
    out = L.Dense(576, name="final_output")(x)
    model = tf.keras.Model(inp, out)

    # L2 is computed MANUALLY in the step (Keras 3 removed post-build
    # add_loss/regularizer mutation) over exactly _l2_in_scope's
    # 'reference' set: stem convs + head dense + backbone {conv1,
    # block2} — block2 on the flax MobileNet tree = keras conv_dw_2 +
    # conv_pw_2.  All layers are use_bias=False except the head, so
    # trainable_weights[0] is the (depthwise) kernel.
    reg_weights = [model.get_layer(n).trainable_weights[0]
                   for n in ("colorizer", "conv2", "conv3",
                             "final_output")]
    reg_weights += [backbone.get_layer(n).trainable_weights[0]
                    for n in ("conv1", "conv_dw_2", "conv_pw_2")]
    return model, backbone, reg_weights


def keras_stem_head_to_flax(model, params, batch_stats):
    """Copy the keras stem + head weights over the flax init (the
    backbone goes through io/keras_import.apply_backbone_weights)."""
    import copy

    params = copy.deepcopy(jax.device_get(params))
    batch_stats = copy.deepcopy(jax.device_get(batch_stats))
    by_name = {l.name: l for l in model.layers}
    for name in ("colorizer", "conv2", "conv3"):
        params["stem"][name]["kernel"] = by_name[name].get_weights()[0]
    for name in ("bn1", "bn2", "bn3"):
        g, b, mu, var = by_name[name].get_weights()
        params["stem"][name] = {"scale": g, "bias": b}
        batch_stats["stem"][name] = {"mean": mu, "var": var}
    k, b = by_name["final_output"].get_weights()
    params["final_output"] = {"kernel": k, "bias": b}
    return params, batch_stats


def keras_loss_fn(y_true, y_pred):
    """tf twin of ops/losses.loss_components ('same' variant)."""
    import tensorflow as tf

    from spnet_tpu.config import (
        IND_A,
        IND_ANGLE1,
        IND_ANGLE2,
        IND_B,
        IND_CX,
        IND_CY,
        IND_NOOBJ,
        IND_RINGS,
        VARS_PER_PRED,
        LossWeights,
    )

    w = LossWeights()
    m = y_true.shape[-1]
    yt = tf.reshape(y_true, (-1, m // VARS_PER_PRED, VARS_PER_PRED))
    yp = tf.reshape(y_pred, (-1, m // VARS_PER_PRED, VARS_PER_PRED))
    d = yp - yt
    pobj = 1.0 - yt[..., IND_NOOBJ]
    center = w.center * pobj * (d[..., IND_CX] ** 2 + d[..., IND_CY] ** 2)
    size = w.size * pobj * (d[..., IND_A] ** 2 + d[..., IND_B] ** 2)
    angle = (w.angle * pobj
             * (d[..., IND_ANGLE1] ** 2 + d[..., IND_ANGLE2] ** 2)
             * (yt[..., IND_A] - yt[..., IND_B]) ** 2)
    noobj = w.noobj * d[..., IND_NOOBJ] ** 2
    rings = w.rings * pobj * d[..., IND_RINGS] ** 2
    total = tf.reduce_sum(center + size + angle + noobj + rings,
                          axis=-1) / float(m)
    return tf.reduce_mean(total)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    input_size = 128
    lr = 4e-5

    import jax.numpy as jnp

    from spnet_tpu.config import ExperimentConfig, GridSpec, ModelConfig
    from spnet_tpu.data.dataset import synthetic_dataset
    from spnet_tpu.io.keras_import import (
        apply_backbone_weights,
        keras_mobilenet_to_flax,
    )
    from spnet_tpu.models.spnet import build_model
    from spnet_tpu.train.state import create_train_state
    from spnet_tpu.train.steps import make_train_step

    grid = GridSpec()
    ds = synthetic_dataset(n_frames, grid, seed=0, input_size=input_size)
    x_all = ((ds.x.astype(np.float32) / 255.0) - 0.5) * 2.0
    y_all = np.asarray(ds.y, np.float32)
    order = np.arange(n_frames)  # fixed, identical batch order
    print(f"data: {x_all.shape} {y_all.shape}", flush=True)

    # --- keras side -------------------------------------------------
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    kmodel, kbackbone, reg_weights = build_keras_twin(input_size, seed=0)
    opt = tf.keras.optimizers.Adam(learning_rate=lr, epsilon=1e-7)

    @tf.function
    def k_step(xb, yb):
        with tf.GradientTape() as tape:
            yp = kmodel(xb, training=True)
            data_loss = keras_loss_fn(yb, yp)
            l2 = tf.add_n([tf.reduce_sum(tf.square(w))
                           for w in reg_weights])
            loss = data_loss + 1e-4 * l2
        grads = tape.gradient(loss, kmodel.trainable_variables)
        opt.apply_gradients(zip(grads, kmodel.trainable_variables))
        return data_loss

    # --- flax side, initialized FROM the keras weights --------------
    cfg = ExperimentConfig(
        grid=grid,
        model=ModelConfig(backbone="MobileNet", input_size=input_size,
                          compute_dtype="float32", dropout_rate=0.0),
    )
    model = build_model(cfg.model)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, input_size, input_size, 1),
                                         jnp.float32),
                               schedule=lambda _: lr)
    bb_params, bb_stats = keras_mobilenet_to_flax(kbackbone)
    params, batch_stats = apply_backbone_weights(
        jax.device_get(state.params), jax.device_get(state.batch_stats),
        bb_params, bb_stats)
    params, batch_stats = keras_stem_head_to_flax(kmodel, params,
                                                  batch_stats)
    state = state.replace(
        params=jax.tree_util.tree_map(jnp.asarray, params),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, batch_stats))

    # init parity: forward pass on the first batch (eval mode)
    xb0 = x_all[order[:batch]]
    yb0 = y_all[order[:batch]]
    yk = kmodel(xb0, training=False).numpy()
    yf = np.asarray(jax.jit(lambda p, s, x: model.apply(
        {"params": p, "batch_stats": s}, x, train=False))(
            state.params, state.batch_stats, xb0))
    fwd_rel = float(np.max(np.abs(yk - yf)) / (np.std(yk) + 1e-12))
    print(f"init forward max|d|/std = {fwd_rel:.3e}", flush=True)

    train_step = make_train_step(model, cfg.loss_weights,
                                 loss_type=cfg.model.loss_type,
                                 l2_reg=cfg.model.l2_reg, augment=False)

    # --- step 1 exact comparison ------------------------------------
    p_before = jax.device_get(state.params)
    state, metrics = train_step(state, jnp.asarray(xb0),
                                jnp.asarray(yb0), jax.random.PRNGKey(1))
    f_loss1 = float(metrics["data_loss"])
    p_after = jax.device_get(state.params)

    # anchors by layer HANDLE (Keras 3 variable names are unscoped, so
    # name matching is useless): stem convs, head, backbone conv1
    anchors = {
        "stem/colorizer": (kmodel.get_layer("colorizer"),
                           ("stem", "colorizer", "kernel")),
        "stem/conv3": (kmodel.get_layer("conv3"),
                       ("stem", "conv3", "kernel")),
        "head/dense": (kmodel.get_layer("final_output"),
                       ("final_output", "kernel")),
        "backbone/conv1": (kbackbone.get_layer("conv1"),
                           ("backbone", "conv1", "conv", "kernel")),
    }
    kw_before = {label: layer.trainable_weights[0].numpy()
                 for label, (layer, _) in anchors.items()}
    k_loss1 = float(k_step(tf.constant(xb0), tf.constant(yb0)))
    kw_after = {label: layer.trainable_weights[0].numpy()
                for label, (layer, _) in anchors.items()}

    def get(tree, path):
        for k in path:
            tree = tree[k]
        return np.asarray(tree)

    step1 = {}
    for label, (_, fpath) in anchors.items():
        dk = kw_after[label] - kw_before[label]
        df = get(p_after, fpath) - get(p_before, fpath)
        denom = np.max(np.abs(dk)) + 1e-30
        step1[label] = {
            "keras_upd_max": float(np.max(np.abs(dk))),
            "flax_upd_max": float(np.max(np.abs(df))),
            "rel_err": float(np.max(np.abs(dk - df)) / denom),
        }
        print(f"step-1 {label}: |dk|max {step1[label]['keras_upd_max']:.3e}"
              f"  |df|max {step1[label]['flax_upd_max']:.3e}"
              f"  rel err {step1[label]['rel_err']:.3e}", flush=True)
    print(f"step-1 loss: keras {k_loss1:.6f}  flax {f_loss1:.6f}",
          flush=True)

    # --- trajectory -------------------------------------------------
    k_losses, f_losses = [k_loss1], [f_loss1]
    for t in range(1, steps):
        lo = (t * batch) % (n_frames - batch + 1)
        xb = x_all[lo:lo + batch]
        yb = y_all[lo:lo + batch]
        k_losses.append(float(k_step(tf.constant(xb), tf.constant(yb))))
        state, metrics = train_step(state, jnp.asarray(xb),
                                    jnp.asarray(yb),
                                    jax.random.PRNGKey(t + 1))
        f_losses.append(float(metrics["data_loss"]))
        if t % 5 == 0 or t == steps - 1:
            print(f"step {t:3d}: keras {k_losses[-1]:.6f} "
                  f"flax {f_losses[-1]:.6f}", flush=True)

    traj_rel = [abs(a - b) / (abs(a) + 1e-12)
                for a, b in zip(k_losses, f_losses)]
    out = {
        "adam_variant": os.environ.get("SPNET_ADAM", "optax"),
        "fwd_rel": fwd_rel,
        "step1": step1,
        "loss_keras_first_last": [k_losses[0], k_losses[-1]],
        "loss_flax_first_last": [f_losses[0], f_losses[-1]],
        "traj_rel_max": max(traj_rel),
        "traj_rel_final": traj_rel[-1],
    }
    print("KERAS_DIFF_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
