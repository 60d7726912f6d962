"""Synthetic ESPI frame generator ("fake backend").

Capability twin of the reference's `gen_fake_espi.py` (multiprocess OpenCV
drawing, `/root/reference/gen_fake_espi.py`), redesigned TPU-first:

  * SCENE SAMPLING (host, numpy): wave parameters, rejection-sampled
    non-overlapping ellipse placement, ring counts.  Cheap, inherently
    sequential, deterministic per frame index (one `np.random.Generator`
    seeded with (seed, frame)) — so the dataset is identical no matter how
    frames are batched or sharded.
  * RENDERING (device, jitted jnp): the whole batch of frames is rendered
    in one fused XLA program — wave interference bands as a modular cosine
    field, antinode rings as constant-pixel-width annuli of the normalized
    ellipse radius, Gaussian blur (3/7), additive clipped Gaussian noise,
    Bernoulli pixel dropout; optional FFT bandpass background mixup
    (`augmentation.bandpass_mixup` twin) via jnp.fft.

Pixel-level output is *visually equivalent*, not bit-identical, to the
reference (cv2.polylines/ellipse raster vs analytic fields); the label
contract (caption CSV rows `cx,cy,a,b,angle,rings`, value distributions,
file naming `steelpan_%07d.png`) is preserved exactly.

Scene parameter distributions (reference lines cited inline):
  waves:  amp ~ U{10..200}, wavelength ~ U{100..256}, thickness ~
          U{15..40}, slope ~ U(-1.5, 1.5), spacing ~ U{t+t*|1.5 s|..128}
          (`gen_fake_espi.py:60-70`)
  antinodes: 1..7 per frame (`:251-252`); semiaxes a ~ U{15..146},
          b ~ U{15..109} sorted desc (`:155-156`); rings ~
          U{1..min(b//8, 11)} (`:160-161`), line-width floor 4px
          (`:164-165`); centers in-bounds; angle ~ U{1..179}; bbox
          non-overlap rejection, <= 2000 tries with wider re-draws
          (`:174-189`)
  post:   blur prob 0.3 ksize in {3,7} — but the primary generator's
          blur is a NO-OP in the reference (`gen_fake_espi.py:257` ->
          `augmentation.py:66-70` discards the cv2 result), so the
          effective default is NO blur (see `sample_scene(blur=...)`);
          noise N(40,40) clipped (`:263`), 0/1 dropout mask (`:267`)
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from spnet_tpu.config import ORIG_IMG_HEIGHT, ORIG_IMG_WIDTH
from spnet_tpu.data.csvio import caption_from_records

MAX_ANTINODES = 7
MAX_RINGS = 11
MIN_LINE_WIDTH = 4  # px per dark-light ring pair (`gen_fake_espi.py:46`)

W, H = ORIG_IMG_WIDTH, ORIG_IMG_HEIGHT


# ---------------------------------------------------------------------------
# Host-side scene sampling
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class Scene:
    """All parameters needed to render one frame, in plain arrays."""

    # waves
    amp: float
    wavelength: float
    thickness: float
    slope: float
    spacing: float
    # antinodes: fixed MAX_ANTINODES slots
    present: np.ndarray  # (MAX_ANTINODES,) bool
    cx: np.ndarray
    cy: np.ndarray
    a: np.ndarray
    b: np.ndarray
    angle: np.ndarray  # degrees
    rings: np.ndarray  # int
    ring_start: np.ndarray  # 0/1: center dark or bright
    # post-processing
    blur_sel: int  # 0 = none, 1 = ksize 3, 2 = ksize 7
    noise_seed: int

    def caption_rows(self) -> list[list[float]]:
        rows = []
        for i in range(MAX_ANTINODES):
            if self.present[i]:
                rows.append(
                    [
                        float(self.cx[i]),
                        float(self.cy[i]),
                        float(self.a[i]),
                        float(self.b[i]),
                        float(self.angle[i]),
                        float(self.rings[i]),
                    ]
                )
        return rows


def _ellipse_bbox(cx, cy, a, b, angle_deg):
    """Loose axis-aligned bbox of a rotated ellipse (the reference's
    rejection test uses this, `gen_fake_espi.py:82-98`)."""
    rad = np.radians(angle_deg)
    dx = np.sqrt(a**2 * np.cos(rad) ** 2 + b**2 * np.sin(rad) ** 2)
    dy = np.sqrt(a**2 * np.sin(rad) ** 2 + b**2 * np.cos(rad) ** 2)
    return (cx - dx, cy - dy, cx + dx, cy + dy)


def _boxes_overlap(p, q):
    return not (p[2] < q[0] or p[0] > q[2] or p[3] < q[1] or p[1] > q[3])


def sample_scene(seed: int, frame: int, variant: str = "primary",
                 blur: bool | None = None) -> Scene:
    """Deterministic scene for one frame.

    variant='hybrid' reproduces the reference's OLDER generator
    (`/root/reference/gen_fake_espi_hybrid.py`): 0..6 antinodes per frame
    (vs 1..7), blur kernel {3, 5} (vs {3, 7}); its other deltas (no pixel
    dropout, no bandpass variant) live in `render_frames`.

    blur: None = the variant's EFFECTIVE reference behavior.  The primary
    generator's blur is a silent no-op — `blur_inplace` discards the
    cv2.GaussianBlur result (`gen_fake_espi.py:257` ->
    `augmentation.py:66-70`), so reference Dataset-A frames are NEVER
    blurred — while the hybrid generator's blur is real
    (`gen_fake_espi_hybrid.py:313-316` keeps the return value).  Pass
    True/False to override (True = the primary author's INTENDED 30 %
    blur).  The dice rolls are drawn either way so every other sampled
    value (incl. noise_seed) is blur-setting-independent."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, frame]))

    # waves
    thickness = float(rng.integers(15, 41))
    slope = float(3.0 * (rng.random() - 0.5))
    lo = thickness + thickness * int(abs(1.5 * slope))
    spacing = float(rng.integers(int(lo), max(int(lo) + 1, H // 3 + 1)))
    amp = float(rng.integers(10, 201))
    wavelength = float(rng.integers(100, W // 2 + 1))

    # antinodes (hybrid: 0..6, `gen_fake_espi_hybrid.py:309-310`)
    if variant == "hybrid":
        n_an = int(rng.integers(0, MAX_ANTINODES))
    else:
        n_an = int(rng.integers(1, MAX_ANTINODES + 1))
    present = np.zeros(MAX_ANTINODES, bool)
    cxs = np.zeros(MAX_ANTINODES, np.float32)
    cys = np.zeros(MAX_ANTINODES, np.float32)
    aas = np.ones(MAX_ANTINODES, np.float32)
    bbs = np.ones(MAX_ANTINODES, np.float32)
    angs = np.zeros(MAX_ANTINODES, np.float32)
    rgs = np.zeros(MAX_ANTINODES, np.int32)
    starts = np.zeros(MAX_ANTINODES, np.int32)

    boxes: list[tuple] = []
    for k in range(n_an):
        ax = sorted(
            (int(rng.integers(15, int(W / 3.5) + 1)),
             int(rng.integers(15, int(H / 3.5) + 1))),
            reverse=True,
        )
        max_rings = min(ax[1] // 8, MAX_RINGS)
        n_rings = int(rng.integers(1, max(max_rings, 1) + 1))
        if ax[1] / n_rings < MIN_LINE_WIDTH:
            n_rings = ax[1] // MIN_LINE_WIDTH
        cx = int(rng.integers(ax[0], W - ax[0] + 1))
        cy = int(rng.integers(ax[1], H - ax[1] + 1))
        ang = int(rng.integers(1, 180))
        box = _ellipse_bbox(cx, cy, ax[0], ax[1], ang)

        tries = 0
        while (
            any(_boxes_overlap(box, bb) for bb in boxes)
            or box[0] < 0
            or box[2] > W
            or box[1] < 0
            or box[3] > H
        ) and tries < 2000:
            tries += 1
            ax = sorted(
                (int(rng.integers(25, W // 3 + 1)),
                 int(rng.integers(25, H // 3 + 1))),
                reverse=True,
            )
            if ax[1] / n_rings < MIN_LINE_WIDTH:
                n_rings = ax[1] // MIN_LINE_WIDTH
            cx = int(rng.integers(ax[0], W - ax[0] + 1))
            cy = int(rng.integers(ax[1], H - ax[1] + 1))
            ang = int(rng.integers(1, 181))
            box = _ellipse_bbox(cx, cy, ax[0], ax[1], ang)

        if tries >= 2000:
            continue  # skip this antinode (reference `gen_fake_espi.py:197-199`)
        boxes.append(box)
        present[k] = True
        cxs[k], cys[k] = cx, cy
        aas[k], bbs[k] = ax[0], ax[1]
        angs[k] = ang
        rgs[k] = max(n_rings, 1)
        starts[k] = int(rng.integers(0, 2))

    blur_sel = 0
    if rng.random() <= 0.3:
        blur_sel = 1 if rng.random() < 0.5 else 2
    if blur is None:
        blur = variant == "hybrid"  # primary's blur is a no-op (docstring)
    if not blur:
        blur_sel = 0
    noise_seed = int(rng.integers(0, 2**31 - 1))

    return Scene(
        amp=amp,
        wavelength=wavelength,
        thickness=thickness,
        slope=slope,
        spacing=spacing,
        present=present,
        cx=cxs,
        cy=cys,
        a=aas,
        b=bbs,
        angle=angs,
        rings=rgs,
        ring_start=starts,
        blur_sel=blur_sel,
        noise_seed=noise_seed,
    )


def scenes_to_arrays(scenes: list[Scene]) -> dict[str, np.ndarray]:
    """Stack scenes into a dict of batched arrays for the device renderer."""
    f32 = np.float32
    return {
        "amp": np.array([s.amp for s in scenes], f32),
        "wavelength": np.array([s.wavelength for s in scenes], f32),
        "thickness": np.array([s.thickness for s in scenes], f32),
        "slope": np.array([s.slope for s in scenes], f32),
        "spacing": np.array([s.spacing for s in scenes], f32),
        "present": np.stack([s.present for s in scenes]).astype(f32),
        "cx": np.stack([s.cx for s in scenes]).astype(f32),
        "cy": np.stack([s.cy for s in scenes]).astype(f32),
        "a": np.stack([s.a for s in scenes]).astype(f32),
        "b": np.stack([s.b for s in scenes]).astype(f32),
        "angle": np.stack([s.angle for s in scenes]).astype(f32),
        "rings": np.stack([s.rings for s in scenes]).astype(f32),
        "ring_start": np.stack([s.ring_start for s in scenes]).astype(f32),
        "blur_sel": np.array([s.blur_sel for s in scenes], np.int32),
        "noise_seed": np.array([s.noise_seed for s in scenes], np.uint32),
    }


# ---------------------------------------------------------------------------
# Device-side rendering
# ---------------------------------------------------------------------------
GREY = 128.0
DARK = 0.0
BRIGHT = GREY + 10.0


def _render_waves(xs, ys, amp, wavelength, thickness, slope, spacing):
    """Dark interference bands: pixels within thickness/2 (vertically) of
    any polyline y = j*spacing - W*|slope| + slope*x + amp*cos(x/lam)
    (`gen_fake_espi.py:60-80`).  The family is periodic in y with period
    `spacing`, so membership is a modular distance test — fully
    elementwise."""
    phase = ys - slope * xs - amp * jnp.cos(xs / wavelength) + W * jnp.abs(slope)
    m = jnp.mod(phase, spacing)
    dist = jnp.minimum(m, spacing - m)
    return dist <= thickness / 2.0  # bool field, True = dark band


def _render_antinode(xs, ys, present, cx, cy, a, b, angle_deg, rings, start):
    """Color contribution + coverage mask of one antinode's concentric
    rings.  Reference draws 2*rings alternating dark/bright ellipse
    outlines at radii (j+1)/(2*rings+1) with pixel thickness
    min(a,b)/(2*rings) (`gen_fake_espi.py:101-114`); here each outline is
    an annulus |r - s_j| <= (t/2)*|grad r| of the normalized radius
    r(x, y), which has the same constant *pixel* width."""
    # NEGATED angle: the annotation convention has y upward ("the web
    # interface is upside down"), so everything that rasterizes on the
    # y-down pixel grid — the reference's draw_ellipse (`utils.py:50`),
    # our IoU rasterizer, the overlay renderer, and this generator —
    # negates the label angle.
    th = jnp.deg2rad(-angle_deg)
    c, s = jnp.cos(th), jnp.sin(th)
    dx, dy = xs - cx, ys - cy
    u = dx * c + dy * s
    v = -dx * s + dy * c
    r2 = (u / a) ** 2 + (v / b) ** 2
    r = jnp.sqrt(jnp.maximum(r2, 1e-12))
    # |grad r| (exact, rotation-invariant)
    grad_r = jnp.sqrt((u / (a * a)) ** 2 + (v / (b * b)) ** 2) / r

    n_wb = 2.0 * rings  # dark+bright ring count
    t_half = jnp.maximum(jnp.minimum(a, b) / n_wb, 1.0) / 2.0
    band = r * (n_wb + 1.0)  # ring j sits at band == j+1
    j = jnp.clip(jnp.round(band) - 1.0, 0.0, n_wb - 1.0)
    dist_r = jnp.abs(band - (j + 1.0)) / (n_wb + 1.0)
    on_ring = (dist_r <= t_half * grad_r) & (r <= 1.1) & (present > 0.5)
    dark = jnp.mod(start + j, 2.0) < 0.5
    color = jnp.where(dark, DARK, BRIGHT)
    return on_ring, color


def _gauss_kernel(ksize: int, sigma: float | None = None) -> np.ndarray:
    """OpenCV-compatible Gaussian kernel (sigma = 0.3*((k-1)*0.5-1)+0.8)."""
    if sigma is None:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize) - (ksize - 1) / 2
    k = np.exp(-(x**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _sep_blur(img, k1d):
    """Separable blur of (B, H, W) with reflective-ish SAME padding."""
    k = jnp.asarray(k1d)
    pad = len(k1d) // 2
    # rows
    x = jnp.pad(img, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    x = jax.vmap(
        lambda im: jnp.einsum(
            "khw,k->hw",
            jnp.stack([im[i : i + img.shape[1]] for i in range(len(k1d))]),
            k,
        )
    )(x)
    # cols
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="edge")
    x = jax.vmap(
        lambda im: jnp.einsum(
            "khw,k->hw",
            jnp.stack(
                [im[:, i : i + img.shape[2]] for i in range(len(k1d))]
            ),
            k,
        )
    )(x)
    return x


@functools.partial(jax.jit, static_argnames=("bandpass", "variant"))
def render_frames(scene_arrays: dict, bandpass: bool = False,
                  real_images=None, variant: str = "primary"):
    """Render a batch of frames from stacked scene parameters.

    Returns float32 (B, H, W) images in [0, 255].
    If `bandpass` and `real_images` (B, H, W) is given, also returns the
    bandpass-mixup variant (low frequencies swapped in from real frames).
    """
    bsz = scene_arrays["amp"].shape[0]
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)

    def render_one(sc):
        img = jnp.full((H, W), GREY, jnp.float32)
        dark = _render_waves(
            xs, ys, sc["amp"], sc["wavelength"], sc["thickness"],
            sc["slope"], sc["spacing"],
        )
        img = jnp.where(dark, DARK, img)
        for k in range(MAX_ANTINODES):
            on, color = _render_antinode(
                xs, ys, sc["present"][k], sc["cx"][k], sc["cy"][k],
                sc["a"][k], sc["b"][k], sc["angle"][k], sc["rings"][k],
                sc["ring_start"][k],
            )
            img = jnp.where(on, color, img)
        return img

    imgs = jax.vmap(render_one)(
        {
            k: scene_arrays[k]
            for k in (
                "amp", "wavelength", "thickness", "slope", "spacing",
                "present", "cx", "cy", "a", "b", "angle", "rings",
                "ring_start",
            )
        }
    )

    # blur (none / 3 / {7 or 5}), branchless per-frame select; the
    # hybrid variant uses ksize 5 (`gen_fake_espi_hybrid.py:314-316`)
    b3 = _sep_blur(imgs, _gauss_kernel(3))
    b_alt = _sep_blur(imgs, _gauss_kernel(5 if variant == "hybrid" else 7))
    sel = scene_arrays["blur_sel"][:, None, None]
    imgs = jnp.where(sel == 1, b3, jnp.where(sel == 2, b_alt, imgs))

    # additive clipped Gaussian noise N(40, 40) + Bernoulli pixel dropout
    # (the hybrid variant stops at the noise: no dropout, no bandpass)
    def noise_one(img, seed):
        key = jax.random.key(seed)
        k1, k2 = jax.random.split(key)
        noise = jnp.clip(
            40.0 + 40.0 * jax.random.normal(k1, img.shape), 0.0, 255.0
        )
        img = jnp.clip(img + noise, 0.0, 255.0)
        if variant == "hybrid":
            return img
        mask = jax.random.bernoulli(k2, 0.5, img.shape)
        return img * mask

    imgs = jax.vmap(noise_one)(imgs, scene_arrays["noise_seed"])

    if bandpass and real_images is not None:
        bp = bandpass_mixup_batch(
            imgs, real_images, scene_arrays["noise_seed"]
        )
        return imgs, bp
    return imgs


def bandpass_mixup_batch(fake, real, seeds, low_width: int = 8):
    """FFT background swap (twin of reference `augmentation.bandpass_mixup`,
    `/root/reference/spnet/augmentation.py:10-62`): keep an 8-px low-pass
    box (centered spectrum) from the REAL frame scaled by U(0,3), mids
    from the fake; magnitude of the inverse transform, min-max normalized
    to [0, 255]."""
    fake = jnp.asarray(fake, jnp.float32)
    real = jnp.asarray(real, jnp.float32)
    ft_f = jnp.fft.fftshift(jnp.fft.fft2(fake), axes=(-2, -1))
    ft_r = jnp.fft.fftshift(jnp.fft.fft2(real), axes=(-2, -1))
    h, w = fake.shape[-2:]
    cy, cx = h // 2, w // 2
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    mask = (
        (yy >= cy - low_width)
        & (yy < cy + low_width)
        & (xx >= cx - low_width)
        & (xx < cx + low_width)
    )

    def mix_one(ff, fr, seed):
        scale = jax.random.uniform(jax.random.key(seed)) * 3.0
        out = jnp.where(mask, scale * fr, ff)
        img = jnp.abs(jnp.fft.ifft2(jnp.fft.ifftshift(out)))
        lo, hi = jnp.min(img), jnp.max(img)
        return jnp.clip((img - lo) / jnp.maximum(hi - lo, 1e-9) * 255.0,
                        0.0, 255.0)

    return jax.vmap(mix_one)(ft_f, ft_r, seeds)


# ---------------------------------------------------------------------------
# Dataset generation driver (files on disk, reference data contract)
# ---------------------------------------------------------------------------
def _load_real_pool(path: str, limit: int = 64) -> np.ndarray:
    """Load up to `limit` real frames (grayscale, native 512x384) to act
    as bandpass-mixup backgrounds (reference `augmentation.py:22`)."""
    import glob

    from PIL import Image

    files = sorted(glob.glob(os.path.join(path, "*.png")))[:limit]
    if not files:
        raise ValueError(f"no real images found in {path} for bandpass")
    out = []
    for f in files:
        img = Image.open(f).convert("L")
        if img.size != (W, H):
            img = img.resize((W, H))
        out.append(np.asarray(img, np.float32))
    return np.stack(out)


def generate_dataset(
    out_dir: str,
    num_frames: int,
    seed: int = 0,
    train_only: bool = True,
    batch: int = 64,
    frame_start: int = 0,
    bandpass: str | None = None,
    variant: str = "primary",
    blur: bool | None = None,
    verbose: bool = True,
) -> None:
    """Write `steelpan_%07d.png` + `.csv` pairs under Train/ (and Val/ for
    the last 20% when not train_only — reference `gen_fake_espi.py:219-227`
    splits by task index; we split by frame fraction, same 80/20 ratio).

    bandpass: optional directory of REAL frames; when given, also writes
    `*_bp.png` variants whose low-frequency background is swapped in from
    a random real frame (reference `gen_fake_espi.py:271-275`)."""
    from PIL import Image

    train_dir = os.path.join(out_dir, "Train")
    os.makedirs(train_dir, exist_ok=True)
    if not train_only:
        os.makedirs(os.path.join(out_dir, "Val"), exist_ok=True)

    real_pool = None
    if bandpass:
        real_pool = _load_real_pool(bandpass)

    for b0 in range(0, num_frames, batch):
        nb = min(batch, num_frames - b0)
        scenes = [sample_scene(seed, frame_start + b0 + i, variant,
                               blur=blur)
                  for i in range(nb)]
        arrays = scenes_to_arrays(scenes)
        if real_pool is not None:
            ridx = np.random.default_rng(seed + b0).integers(
                0, real_pool.shape[0], nb
            )
            imgs_f, imgs_bp = render_frames(
                arrays, bandpass=True, real_images=real_pool[ridx],
                variant=variant,
            )
            imgs = np.asarray(imgs_f).astype(np.uint8)
            bps = np.asarray(imgs_bp).astype(np.uint8)
        else:
            imgs = np.asarray(
                render_frames(arrays, variant=variant)
            ).astype(np.uint8)
            bps = None
        for i, sc in enumerate(scenes):
            frame = frame_start + b0 + i
            frac = (b0 + i) / num_frames
            sub = "Train" if (train_only or frac < 0.8) else "Val"
            prefix = os.path.join(
                out_dir, sub, f"steelpan_{frame:07d}"
            )
            rows = sc.caption_rows()
            # the hybrid variant writes an explicit all-zeros row for
            # empty frames (`gen_fake_espi_hybrid.py:302-303`); the
            # rings<=0 parse filter drops it downstream, like the
            # reference's parse_meta_file
            caption = (caption_from_records(rows) if rows
                       else "0,0,0,0,0,0.0")
            Image.fromarray(imgs[i], mode="L").save(prefix + ".png")
            with open(prefix + ".csv", "w") as f:
                f.write(caption)
            if bps is not None:
                # the reference writes *_bp.png with NO metadata twin
                # (`gen_fake_espi.py:275`), which breaks its own paired
                # loader; we write the matching .csv as well.
                Image.fromarray(bps[i], mode="L").save(prefix + "_bp.png")
                with open(prefix + "_bp.csv", "w") as f:
                    f.write(caption)
        if verbose:
            print(f"  generated {min(b0 + nb, num_frames)}/{num_frames}",
                  end="\r")
    if verbose:
        print()


def generate_arrays(
    num_frames: int, seed: int = 0, frame_start: int = 0, batch: int = 64
):
    """In-memory fast path: yields (images_uint8 (B,H,W), list[Scene]) —
    lets training consume synthetic data without a PNG round-trip."""
    for b0 in range(0, num_frames, batch):
        nb = min(batch, num_frames - b0)
        scenes = [sample_scene(seed, frame_start + b0 + i) for i in range(nb)]
        arrays = scenes_to_arrays(scenes)
        imgs = np.asarray(render_frames(arrays)).astype(np.uint8)
        yield imgs, scenes
