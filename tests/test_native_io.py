"""Native C++ loader tests: exact pixel parity with PIL at native
resolution, approximate parity after resize, batch API, dims probe."""

import numpy as np
import pytest

from spnet_tpu.data.dataset import build_x, load_image
from spnet_tpu.data.synth import generate_dataset

native_io = pytest.importorskip("spnet_tpu.native.io")

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native loader not built"
)


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    generate_dataset(str(d), 4, seed=9, batch=4, verbose=False)
    import glob
    import os

    return sorted(glob.glob(os.path.join(str(d), "Train", "*.png")))


def test_native_resolution_exact(pngs):
    x = native_io.load_images(pngs, size=None)
    assert x.shape == (4, 384, 512, 1)
    ref = np.stack([load_image(p, None) for p in pngs])
    np.testing.assert_allclose(x, ref, atol=1e-6)


def test_resized_close_to_pil(pngs):
    """Default resample is the Lanczos3 PIL-ANTIALIAS twin (reference
    `utils.py:337`); 'box' keeps the area-average path.  Each native
    filter must track its PIL counterpart to rounding noise."""
    for method in ("lanczos3", "box"):
        x = native_io.load_images(pngs, size=128, method=method)
        ref = np.stack([load_image(p, 128, method=method) for p in pngs])
        assert x.shape == ref.shape == (4, 128, 128, 1)
        assert np.abs(x - ref).mean() < 0.01, method
        assert np.corrcoef(x.ravel(), ref.ravel())[0, 1] > 0.999, method
    # and the two filters genuinely differ (lanczos is sharper)
    a = native_io.load_images(pngs, size=128, method="lanczos3")
    b = native_io.load_images(pngs, size=128, method="box")
    assert np.abs(a - b).mean() > 1e-4


def test_png_dims(pngs):
    assert native_io.png_dims(pngs[0]) == (512, 384)


def test_build_x_uses_native(pngs):
    # dispatch path: build_x must produce the same result as the direct
    # native call when the library is available
    a = build_x(pngs, size=96, verbose=False)
    b = native_io.load_images(pngs, size=96)
    np.testing.assert_allclose(a, b)


def test_build_x_bmp_fallback(tmp_path, pngs):
    """Non-PNG inputs (the reference supports .bmp movie frames) must
    fall back to PIL, not be zero-filled by the native decoder."""
    from PIL import Image

    bmps = []
    for i, p in enumerate(pngs[:2]):
        bp = str(tmp_path / f"f{i}.bmp")
        Image.open(p).save(bp)
        bmps.append(bp)
    x = build_x(bmps, size=96, verbose=False)
    assert x.shape == (2, 96, 96, 1)
    assert np.abs(x).mean() > 0.01  # actual pixels, not zero fill


def test_unsupported_png_retried_via_pil(tmp_path, pngs):
    """Palette-mode PNGs are outside the native decode subset; they must
    come back through the PIL retry path with real pixels, not silent
    zero fill."""
    from PIL import Image

    pal = str(tmp_path / "pal.png")
    Image.open(pngs[0]).convert("P").save(pal)
    batch = [pngs[1], pal, pngs[2]]
    x = native_io.load_images(batch, size=96)
    ref = np.stack([load_image(p, 96) for p in batch])
    assert np.abs(x[1]).mean() > 0.01  # not zero-filled
    assert np.abs(x[1] - ref[1]).mean() < 0.02


def test_truncated_ihdr_rejected_cleanly(tmp_path, pngs):
    """A PNG whose IHDR chunk claims length 0 must fail decode (and fall
    through to PIL, which also rejects it -> caller sees the exception),
    not read past the buffer."""
    import struct

    raw = open(pngs[0], "rb").read()
    # signature + zero-length IHDR chunk, then EOF
    bad = raw[:8] + struct.pack(">I", 0) + b"IHDR" + b"\0\0\0\0"
    p = str(tmp_path / "trunc.png")
    open(p, "wb").write(bad)
    with pytest.raises(Exception):
        native_io.load_images([p], size=96)
