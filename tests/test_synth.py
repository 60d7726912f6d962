"""Synthetic ESPI generator tests: determinism, label contract, render
sanity, dataset file layout (capability parity with
`/root/reference/gen_fake_espi.py`)."""

import glob
import os

import numpy as np
import pytest

from spnet_tpu.config import GridSpec
from spnet_tpu.data.csvio import paired_file_lists, parse_meta_file
from spnet_tpu.data.synth import (
    MAX_ANTINODES,
    generate_dataset,
    render_frames,
    sample_scene,
    scenes_to_arrays,
)
from spnet_tpu.grid import canonicalize_records, ellipses_to_grid


def test_scene_determinism():
    s1 = sample_scene(0, 42)
    s2 = sample_scene(0, 42)
    np.testing.assert_array_equal(s1.cx, s2.cx)
    np.testing.assert_array_equal(s1.rings, s2.rings)
    assert s1.amp == s2.amp
    s3 = sample_scene(0, 43)
    assert (s1.cx != s3.cx).any() or s1.amp != s3.amp


def test_primary_blur_is_noop_like_reference():
    """The reference's primary generator never actually blurs: its
    blur_inplace discards the cv2.GaussianBlur result
    (`gen_fake_espi.py:257` -> `augmentation.py:66-70`).  Default
    ('auto') must reproduce that: blur_sel == 0 on every primary frame.
    blur=True opts back into the intended 30% blur; the hybrid variant
    (whose blur is real, `gen_fake_espi_hybrid.py:313-316`) keeps it.
    Every OTHER sampled value must be identical across blur settings
    (the dice are rolled either way)."""
    on = [sample_scene(9, f, blur=True) for f in range(40)]
    off = [sample_scene(9, f) for f in range(40)]
    assert all(s.blur_sel == 0 for s in off)
    assert any(s.blur_sel != 0 for s in on)  # ~30% expected
    for a, b in zip(on, off):
        np.testing.assert_array_equal(a.cx, b.cx)
        np.testing.assert_array_equal(a.rings, b.rings)
        assert a.noise_seed == b.noise_seed
    hy = [sample_scene(9, f, "hybrid") for f in range(40)]
    assert any(s.blur_sel != 0 for s in hy)


def test_scene_label_distributions():
    for f in range(20):
        sc = sample_scene(1, f)
        n = int(sc.present.sum())
        assert 1 <= n <= MAX_ANTINODES
        for k in np.nonzero(sc.present)[0]:
            assert sc.a[k] >= sc.b[k]  # semimajor >= semiminor
            assert 1 <= sc.rings[k] <= 11
            assert 1 <= sc.angle[k] <= 180
            # in-bounds bbox-ish check on centers
            assert 0 <= sc.cx[k] <= 512 and 0 <= sc.cy[k] <= 384


def test_scene_nonoverlap():
    """Bounding boxes of placed antinodes must not overlap."""
    from spnet_tpu.data.synth import _boxes_overlap, _ellipse_bbox

    for f in range(10):
        sc = sample_scene(2, f)
        boxes = [
            _ellipse_bbox(sc.cx[k], sc.cy[k], sc.a[k], sc.b[k], sc.angle[k])
            for k in np.nonzero(sc.present)[0]
        ]
        for i in range(len(boxes)):
            for j in range(i + 1, len(boxes)):
                assert not _boxes_overlap(boxes[i], boxes[j])


def test_render_batch():
    scenes = [sample_scene(3, f) for f in range(4)]
    imgs = np.asarray(render_frames(scenes_to_arrays(scenes)))
    assert imgs.shape == (4, 384, 512)
    assert imgs.min() >= 0.0 and imgs.max() <= 255.0
    # dropout kills ~half the pixels
    frac_zero = (imgs == 0).mean()
    assert 0.3 < frac_zero < 0.7
    # image has structure (not constant)
    assert imgs.std() > 20


def test_labels_fit_grid():
    """Generated labels must encode into the default 6x6x2 grid (that is
    the reference's operating regime)."""
    g = GridSpec()
    overflow = 0
    for f in range(30):
        sc = sample_scene(4, f)
        recs = canonicalize_records(np.array(sc.caption_rows()))
        try:
            ellipses_to_grid(recs, g)
        except Exception:
            overflow += 1
    # non-overlapping ellipses of radius >= 15 rarely exceed 2 per 71x51
    # cell; tolerate a small overflow rate
    assert overflow <= 2


def test_generate_dataset(tmp_path):
    out = str(tmp_path)
    generate_dataset(out, 6, seed=5, train_only=True, batch=4, verbose=False)
    imgs, metas = paired_file_lists(os.path.join(out, "Train") + os.sep)
    assert len(imgs) == 6
    assert os.path.basename(imgs[0]) == "steelpan_0000000.png"
    recs = parse_meta_file(metas[0])
    assert recs.shape[1] == 8
    from PIL import Image

    arr = np.asarray(Image.open(imgs[0]))
    assert arr.shape == (384, 512)


def test_generate_dataset_bandpass(tmp_path):
    # first make a small "real" pool, then a bandpass-mixed set using it
    real = str(tmp_path / "real")
    generate_dataset(real, 2, seed=8, batch=2, verbose=False)
    out = str(tmp_path / "bp")
    generate_dataset(out, 2, seed=9, batch=2, verbose=False,
                     bandpass=os.path.join(real, "Train"))
    imgs, metas = paired_file_lists(os.path.join(out, "Train") + os.sep)
    # each frame has a plain and a _bp variant, both with metadata
    assert len(imgs) == 4
    assert any("_bp.png" in f for f in imgs)
    bp = [f for f in imgs if f.endswith("_bp.png")][0]
    import numpy as np
    from PIL import Image

    arr = np.asarray(Image.open(bp))
    assert arr.shape == (384, 512) and arr.std() > 10


def test_rendered_rings_match_label_ellipse():
    """The ring pattern drawn for an antinode must lie INSIDE the labeled
    ellipse (same -angle screen convention as the IoU rasterizer and the
    overlay renderer) — guards against angle-sign mismatches between
    generator pixels and labels."""
    import jax
    import jax.numpy as jnp

    from spnet_tpu.data.synth import _render_antinode
    from spnet_tpu.ops.raster import ellipse_mask_jit

    ys = np.arange(384, dtype=np.float32)[:, None] * np.ones((1, 512),
                                                             np.float32)
    xs = np.ones((384, 1), np.float32) * np.arange(512,
                                                   dtype=np.float32)[None]
    rng = np.random.default_rng(0)
    for _ in range(5):
        cx, cy = rng.uniform(150, 350), rng.uniform(120, 260)
        a, b = rng.uniform(60, 120), rng.uniform(30, 60)
        ang = rng.uniform(1, 179)
        rings = rng.integers(2, 6)
        on, _color = jax.jit(_render_antinode)(
            jnp.asarray(xs), jnp.asarray(ys), 1.0, cx, cy, a, b,
            float(ang), float(rings), 0.0,
        )
        on = np.asarray(on)
        label_mask = np.asarray(ellipse_mask_jit(
            cx, cy, a * 1.05 + 2, b * 1.05 + 2,
            float(-np.deg2rad(ang)),
        ))
        assert on.sum() > 200  # rings actually drawn
        frac_inside = (on & label_mask).sum() / on.sum()
        assert frac_inside > 0.99, (cx, cy, a, b, ang, rings,
                                    frac_inside)


def test_hybrid_variant(tmp_path):
    """The hybrid generator delta (`gen_fake_espi_hybrid.py`): 0..6
    antinodes with an all-zeros caption for empty frames, no pixel
    dropout (so frames have no zeroed-out speckle holes beyond the dark
    bands), and the parse pipeline drops the zero rows."""
    # antinode-count range shifts down to 0..6
    counts = [int(sample_scene(5, i, "hybrid").present.sum())
              for i in range(200)]
    assert min(counts) == 0 and max(counts) <= 6

    d = str(tmp_path / "hyb")
    generate_dataset(d, 12, seed=5, batch=12, variant="hybrid",
                     verbose=False)
    csvs = sorted(glob.glob(os.path.join(d, "Train", "*.csv")))
    assert len(csvs) == 12
    empties = [c for c in csvs
               if open(c).read().strip() == "0,0,0,0,0,0.0"]
    assert empties, "expected at least one all-zeros caption in 12 frames"
    recs = parse_meta_file(empties[0])
    assert recs.shape[0] == 0  # rings<=0 filter drops the zero row


def test_blur_prob_knob():
    """augment_on_the_fly: blur_prob=0 (the reference's effective recipe)
    must leave non-cutout/salt pixels crisp; blur_prob=1 must change most
    pixels."""
    import jax
    import jax.numpy as jnp

    from spnet_tpu.ops.augment import random_blur

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 1)).astype(np.float32))
    same = random_blur(x, jax.random.key(0), prob=0.0)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(x))
    blurred = random_blur(x, jax.random.key(0), prob=1.0)
    assert np.abs(np.asarray(blurred) - np.asarray(x)).mean() > 0.1


def test_dataset_prefix_determinism():
    """A smaller synthetic_dataset is exactly the prefix of a larger
    same-recipe one (frame i depends only on (seed, i)) — the contract
    behind scripts/dataset_a_run.py's cache slicing, which serves the
    first n frames of a larger cached dataset instead of regenerating."""
    from spnet_tpu.data.dataset import synthetic_dataset

    grid = GridSpec()
    big = synthetic_dataset(8, grid, seed=11, input_size=64)
    small = synthetic_dataset(4, grid, seed=11, input_size=64)
    np.testing.assert_array_equal(big.x[:4], small.x)
    np.testing.assert_allclose(big.y[:4], small.y)
    np.testing.assert_array_equal(big.row_mask[:4], small.row_mask)
    np.testing.assert_array_equal(big.rows[:4], small.rows)
