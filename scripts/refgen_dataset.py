#!/usr/bin/env python3
"""Dataset-A clone rendered with the REFERENCE's own cv2 drawing code.

Round-4 decisive experiment (VERDICT.md #1): our accuracy campaign
attributes the residual ~1.1-pt ring-acc gap to cross-generator
ambiguity — our frames are an analytic ring-field re-implementation,
the reference's are cv2 polyline/ellipse rasterizations
(`/root/reference/gen_fake_espi.py:145-206,217-277`).  To test that
claim, this script re-creates the reference generator's EXACT drawing
pipeline host-side (numpy+cv2, the same cv2 primitives with the same
parameters) and emits npz shards in the trainer's device-resident
uint8 format, so the exact Dataset-A recipe can be trained and
evaluated on reference-style frames.

Pipeline per frame (matching `gen_fake_espi.py:239-277`):
  grey 128 background -> draw_waves (cosine polylines, black, thick
  15-40) -> 1..7 non-overlapping ring ellipses (cv2.ellipse LINE_AA,
  shift=10, -angle) -> [blur: a silent NO-OP in the reference —
  `blur_inplace` discards the cv2 result, so skipped] -> additive
  N(40,40) noise via cv2.randn (saturating uint8) -> 0/1 pixel dropout
  mask -> PIL LANCZOS resize 512x384 -> input_size (the reference's
  ANTIALIAS path, `utils.py:337`).  The `_bp.png` bandpass-mixup twin
  needs real Zooniverse frames (not available offline) and is not part
  of the paired png+csv contract the reference trains on
  (`utils.py:455-459` asserts one png per csv), so it is not rendered.

Randomness: per-frame `random.Random` / `np.random.RandomState` /
`cv2.setRNGSeed` streams (deterministic, shard-resumable).  The
reference seeds its globals once per process; distributions are
identical, sequences are not (and need not be — the claim under test
is distribution-level).

Usage: python scripts/refgen_dataset.py [total_frames] [input_size]
Writes shards to logs/refgen_cache/ (resumable; skips complete shards).
"""

from __future__ import annotations

import os
import random
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

W, H = 512, 384  # reference imWidth/imHeight (gen_fake_espi.py:31-32)
MIN_LINE_WIDTH = 4  # px per ring pair (gen_fake_espi.py:46)
SHARD = 2048
BLACK, GREY = 0, 128


def draw_waves(img, rnd: random.Random, rs: np.random.RandomState):
    """Background cosine stripes (`gen_fake_espi.py:60-80`)."""
    xs = np.arange(0, W)
    amp = rnd.randint(10, 200)
    x_wavelength = rnd.randint(100, W // 2)
    thickness = rnd.randint(15, 40)
    slope = 3 * (rs.rand() - 0.5)
    y_spacing = rnd.randint(
        thickness + thickness * int(np.abs(1.5 * slope)), H // 3)
    numlines = 60 + H // y_spacing
    cos_term = amp * np.cos(xs / x_wavelength)
    for j in range(numlines):
        y_start = j * y_spacing - W * abs(slope)  # img.shape[1] == W
        ys = (y_start + slope * xs + cos_term).astype(np.int64)
        pts = np.stack([xs, ys], axis=1).astype(np.int32)
        cv2.polylines(img, [pts], False, BLACK, thickness=thickness)


def ellipse_box(center, axes, angle_deg):
    """Axis-aligned bbox of a rotated ellipse (`gen_fake_espi.py:82-98`)."""
    rad = np.radians(angle_deg)
    a, b = axes
    dx = np.sqrt(a**2 * np.cos(rad) ** 2 + b**2 * np.sin(rad) ** 2)
    dy = np.sqrt(a**2 * np.sin(rad) ** 2 + b**2 * np.cos(rad) ** 2)
    return [center[0] - dx, center[1] - dy, center[0] + dx, center[1] + dy]


def boxes_overlap(a, b):
    return not (a[2] < b[0] or a[0] > b[2] or a[3] < b[1] or a[1] > b[3])


def draw_ring_ellipse(img, center, axes, angle, color, thickness):
    """The reference's sub-pixel AA ellipse (`utils.py:35-54`): shift=10
    fixed-point center/axes, LINE_AA, NEGATED angle (the web interface
    is 'upside down')."""
    shift = 10
    center = (int(round(center[0] * 2**shift)),
              int(round(center[1] * 2**shift)))
    axes = (int(round(axes[0] * 2**shift)),
            int(round(axes[1] * 2**shift)))
    cv2.ellipse(img, center, axes, -angle, 0, 360, color, thickness,
                cv2.LINE_AA, shift)


def draw_rings(img, center, axes, angle, num_rings,
               rs: np.random.RandomState):
    """Concentric alternating rings (`gen_fake_espi.py:101-114`)."""
    num_wb = 2 * num_rings if num_rings > 0 else 1
    thickness = int(round(min(axes) / num_wb))
    rand_start = rs.choice([0, 1])
    for j in range(num_wb):
        color = BLACK if (rand_start + j) % 2 == 0 else GREY + 10
        sub_axes = [ax * (j + 1) * 1.0 / (num_wb + 1) for ax in axes]
        draw_ring_ellipse(img, center, sub_axes, angle, color, thickness)


def draw_antinodes(img, num_antinodes, rnd, rs):
    """Rejection-sampled non-overlapping antinodes
    (`gen_fake_espi.py:145-206`), including its quirks: the redo branch
    samples from a different axes range and does NOT refresh num_rings
    except through the line-width clamp; angle ranges differ (1..179
    first try, 1..180 redos)."""
    boxes, rows = [], []
    for _ in range(num_antinodes):
        axes = (rnd.randint(15, int(W / 3.5)), rnd.randint(15, int(H / 3.5)))
        axes = sorted(axes, reverse=True)
        max_rings = min(axes[1] // 8, 11)
        num_rings = rnd.randint(1, max_rings)
        if axes[1] / num_rings < MIN_LINE_WIDTH:
            num_rings = axes[1] // MIN_LINE_WIDTH
        center = (rnd.randint(axes[0], W - axes[0]),
                  rnd.randint(axes[1], H - axes[1]))
        angle = rnd.randint(1, 179)
        box = ellipse_box(center, axes, angle)

        trycount, maxtries = 0, 2000
        while ((any(boxes_overlap(box, b) for b in boxes)
                or box[0] < 0 or box[2] > W or box[1] < 0 or box[3] > H)
               and trycount < maxtries):
            trycount += 1
            axes = sorted((rnd.randint(25, W // 3), rnd.randint(25, H // 3)),
                          reverse=True)
            if axes[1] / num_rings < MIN_LINE_WIDTH:
                num_rings = axes[1] // MIN_LINE_WIDTH
            center = (rnd.randint(axes[0], W - axes[0]),
                      rnd.randint(axes[1], H - axes[1]))
            angle = rnd.randint(1, 180)
            box = ellipse_box(center, axes, angle)

        if trycount < maxtries:
            draw_rings(img, center, axes, angle, num_rings, rs)
            rows.append([center[0], center[1], axes[0], axes[1],
                         angle, num_rings])
            boxes.append(box)
    return rows


def render_frame(seed: int, idx: int):
    """One reference-pipeline frame -> (uint8 (H, W), raw label rows)."""
    rnd = random.Random((seed << 32) ^ (idx * 2654435761 & 0xFFFFFFFF))
    rs = np.random.RandomState((seed * 1000003 + idx) % (2**31 - 1))
    cv2.setRNGSeed((seed * 7 + idx * 13) % (2**31 - 1))

    img = GREY * np.ones((H, W, 1), np.uint8)
    draw_waves(img, rnd, rs)
    num_antinodes = rnd.randint(1, 7)  # gen_fake_espi.py:251-252
    rows = draw_antinodes(img, num_antinodes, rnd, rs)
    # blur_inplace: no-op (result discarded, augmentation.py:66-70)
    noise = np.zeros((H, W, 1), np.uint8)
    cv2.randn(noise, 40, 40)  # gen_fake_espi.py:263
    img = cv2.add(img, noise)  # cv2 squeezes to (H, W)
    mask = rs.randint(0, 2, size=img.shape).astype(np.uint8)
    img = img * mask  # gen_fake_espi.py:267-268 (0/1 pixel dropout)
    return img.reshape(H, W), rows


def resize_frame(img: np.ndarray, size: int | None) -> np.ndarray:
    """The reference's load path: PIL ANTIALIAS(==LANCZOS) square resize
    (`utils.py:337`).  size 0/None keeps native 512x384."""
    if not size:
        return img
    from PIL import Image

    return np.asarray(
        Image.fromarray(img).resize((size, size), Image.LANCZOS))


def gen_shard(seed, start, count, size):
    from spnet_tpu.data.dataset import pad_raw_rows

    xs = np.zeros((count, size or H, size or W, 1), np.uint8)
    raws = []
    for i in range(count):
        img, rows = render_frame(seed, start + i)
        xs[i, :, :, 0] = resize_frame(img, size)
        raws.append(np.array(rows, np.float32).reshape(-1, 6))
    rows_arr, mask_arr = pad_raw_rows(raws)
    return xs, rows_arr, mask_arr


def main():
    # pure host-side work: make sure any incidental jax use in imported
    # spnet_tpu modules can never claim the (single-process) TPU
    import jax

    jax.config.update("jax_platforms", "cpu")
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 45952
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 331
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    outdir = "logs/refgen_cache"
    os.makedirs(outdir, exist_ok=True)
    import time

    t0 = time.time()
    n_shards = (total + SHARD - 1) // SHARD
    for s in range(n_shards):
        start = s * SHARD
        count = min(SHARD, total - start)
        path = os.path.join(outdir, f"refgen_s{seed}_i{size}_{s:04d}.npz")
        if os.path.exists(path):
            print(f"shard {s}/{n_shards}: exists, skip", flush=True)
            continue
        xs, rows, mask = gen_shard(seed, start, count, size)
        tmp = path + ".tmp.npz"
        np.savez(tmp, x=xs, rows=rows, mask=mask)
        os.replace(tmp, path)
        done = start + count
        rate = done / (time.time() - t0 + 1e-9)
        print(f"shard {s}/{n_shards} done ({done}/{total} frames, "
              f"{rate:.1f} fr/s, eta {(total-done)/max(rate,1e-9):.0f}s)",
              flush=True)
    print("REFGEN_DONE", flush=True)


if __name__ == "__main__":
    main()
