"""`spnet-augment` — offline dataset inflation (flip/rotate/translate).

Capability twin of `/root/reference/augment_preproc.py`: for every
image+CSV pair produce `n_augs` randomized variants — flip in {none, v,
h, vh}, rotation U(-20, 20) deg, translation (0 or U(-40, 40) px per
axis) — writing new files with the reference's provenance-encoding
suffixes (`_v/_h/_vh`, `_r<angle>`, `_t<dx>,<dy>` —
`augmentation.py:106-112,206,238`).

The warps run batched on device (bilinear resampling, label remap in the
same jitted program) instead of per-file OpenCV calls in a process pool.

NOTE: with the on-device geometric augmentation available at train time,
offline inflation is unnecessary for this framework; this tool exists for
data-contract parity (producing augmented datasets other tools can read).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from spnet_tpu.data.csvio import (
    paired_file_lists,
    read_raw_meta,
    write_meta_file,
)
from spnet_tpu.ops.augment import (
    flip_image_and_labels,
    rotate_image_and_labels,
    translate_image_and_labels,
)

MAX_ROWS = 16  # fixed-slot padding for label rows


@jax.jit
def _augment_one(img, rows, mask, rot_angle, tx, ty, flip_sel):
    """flip_sel: 0 none, 1 v, 2 h, 3 vh (static branches folded via
    switch on traced selector using lax.switch over the 4 variants)."""

    def mk(mode):
        def f(operand):
            im, rw = operand
            return flip_image_and_labels(im, rw, mask, mode)

        return f

    img, rows = jax.lax.switch(
        flip_sel, [mk(-2), mk(0), mk(1), mk(-1)], (img, rows)
    )
    img, rows = rotate_image_and_labels(img, rows, mask, rot_angle)
    img, rows = translate_image_and_labels(img, rows, mask, tx, ty)
    return img, rows


def augment_one_file(img_path, meta_path, n_augs, rng):
    from PIL import Image

    img = np.asarray(Image.open(img_path), np.float32)
    if img.ndim == 2:
        img = img[..., None]
    raw = read_raw_meta(meta_path)
    n = raw.shape[0]
    rows = np.zeros((MAX_ROWS, 6), np.float32)
    rows[:n] = raw[:MAX_ROWS]
    mask = np.zeros((MAX_ROWS,), bool)
    mask[:n] = True

    prefix = os.path.splitext(img_path)[0]
    for _ in range(n_augs):
        flip_sel = int(rng.integers(0, 4))
        rot = float(rng.uniform(-20, 20))
        if rng.integers(0, 10) == 0:
            tx = ty = 0.0
        else:
            tx = float(np.round(rng.uniform(-40, 40)))
            ty = float(np.round(rng.uniform(-40, 40)))
        out_img, out_rows = _augment_one(
            jnp.asarray(img), jnp.asarray(rows), jnp.asarray(mask),
            rot, tx, ty, flip_sel,
        )
        suffix = ["", "_v", "_h", "_vh"][flip_sel]
        suffix += f"_r{rot:>.2f}"
        if tx or ty:
            suffix += f"_t{int(tx)},{int(ty)}"
        out_prefix = prefix + suffix
        arr = np.clip(np.asarray(out_img), 0, 255).astype(np.uint8)
        Image.fromarray(arr.squeeze(-1), "L").save(out_prefix + ".png")
        write_meta_file(out_prefix + ".csv",
                        np.asarray(out_rows)[mask].tolist())


def augment_data(path: str = "Train", n_augs: int = 39,
                 seed: int = 0) -> None:
    imgs, metas = paired_file_lists(
        path if path.endswith(os.sep) else path + os.sep
    )
    print(f"augment_data: inflating {len(imgs)} files in {path} "
          f"by {n_augs + 1}x")
    rng = np.random.default_rng(seed)
    for i, (im, mt) in enumerate(zip(imgs, metas)):
        if i % 10 == 0:
            print(f"     progress: {i}/{len(imgs)}", end="\r")
        augment_one_file(im, mt, n_augs, rng)
    print()


def main(argv=None):
    p = argparse.ArgumentParser(
        description="augments data in path",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("-d", "--datapath", default="Train/")
    p.add_argument("-n", "--naugs", type=int, default=42)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    augment_data(path=args.datapath, n_augs=args.naugs, seed=args.seed)


if __name__ == "__main__":
    main()
