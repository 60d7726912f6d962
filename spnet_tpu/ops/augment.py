"""On-device, batched data augmentation.

Replaces the reference's host-side augmentation in BOTH of its forms:

  * the per-epoch in-place host loop `AugmentOnTheFly`
    (`/root/reference/spnet/callbacks.py:272-341`): label-PRESERVING ops
    (cutout, salt & pepper, blur) applied to the already-encoded training
    set.  Here they are pure jitted functions of (images, rng) that run
    inside/beside the train step — no pristine host copy, no CPU hot loop.
  * the offline 42x dataset inflation `augment_preproc.py` +
    `spnet/augmentation.py`: label-TRANSFORMING ops (flip / rotate /
    translate) that remap ellipse parameters.  Batched versions operate on
    (images, raw ellipse rows) and are used by the augment CLI and by the
    on-the-fly geometric augmentation path.

All randomness flows from explicit `jax.random` keys -> bitwise
reproducible under any device layout.

Reference quirk NOT replicated: `blur_inplace` discards the result of
cv2.GaussianBlur (`/root/reference/spnet/augmentation.py:66-70`), making
the reference's train-time blur a silent no-op; ours actually blurs.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Label-preserving ops (train-time, images already normalized to [-1, 1])
# ---------------------------------------------------------------------------

CUTOUT_MAX_REGIONS = 6
CUTOUT_MIN = 11
CUTOUT_MAX = 75
SALT_AMOUNT = 0.004
SALT_VS_PEPPER = 0.2


def cutout(images, key, max_regions: int = CUTOUT_MAX_REGIONS):
    """Random rectangular occlusions filled with a random grey level drawn
    from each image's own value range (reference `cutout_inplace`,
    `augmentation.py:117-134`).  images: (B, H, W, C)."""
    b, h, w, _ = images.shape
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    nreg = jax.random.randint(k1, (b,), 0, max_regions + 1)
    y0 = jax.random.randint(k2, (b, max_regions), 0, h - CUTOUT_MIN)
    x0 = jax.random.randint(k5, (b, max_regions), 0, w - CUTOUT_MIN)
    rh = jax.random.randint(k3, (b, max_regions), CUTOUT_MIN, CUTOUT_MAX)
    rw = jax.random.randint(k6, (b, max_regions), CUTOUT_MIN, CUTOUT_MAX)
    lo = jnp.min(images, axis=(1, 2, 3))
    hi = jnp.max(images, axis=(1, 2, 3))
    u = jax.random.uniform(k4, (b, max_regions))
    vals = lo[:, None] + u * (hi - lo)[:, None]

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def apply_one(img, n, y0i, x0i, rhi, rwi, vi):
        def body(r, im):
            inside = (
                (ys >= y0i[r])
                & (ys < jnp.minimum(y0i[r] + rhi[r], h - 1))
                & (xs >= x0i[r])
                & (xs < jnp.minimum(x0i[r] + rwi[r], w - 1))
                & (r < n)
            )
            return jnp.where(inside[:, :, None], vi[r], im)

        return jax.lax.fori_loop(0, max_regions, body, img)

    return jax.vmap(apply_one)(images, nreg, y0, x0, rh, rw, vals)


def salt_and_pepper(images, key, amount: float = SALT_AMOUNT,
                    svp: float = SALT_VS_PEPPER):
    """Random white/black pixels, applied to each image with prob 0.5
    (reference `salt_n_pepa_inplace`, `augmentation.py:157-180`).  Salt
    takes each image's max value, pepper its min."""
    b = images.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    active = jax.random.bernoulli(k1, 0.5, (b,))
    r = jax.random.uniform(k2, images.shape)
    p_salt = amount * svp
    p_pepper = amount * (1.0 - svp)
    lo = jnp.min(images, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(images, axis=(1, 2, 3), keepdims=True)
    out = jnp.where(r < p_salt, hi, images)
    out = jnp.where((r >= p_salt) & (r < p_salt + p_pepper), lo, out)
    return jnp.where(active[:, None, None, None], out, images)


def _gauss1d(ksize: int) -> np.ndarray:
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize) - (ksize - 1) / 2
    k = np.exp(-(x**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def random_blur(images, key, prob: float = 0.4):
    """Per-image Gaussian blur with probability `prob`, ksize in {3, 7}
    (intent of reference `AugmentOnTheFly.blur` -> `blur_inplace`)."""
    b, h, w, c = images.shape
    k1, k2 = jax.random.split(key)
    do = jax.random.bernoulli(k1, prob, (b,))
    pick7 = jax.random.bernoulli(k2, 0.5, (b,))

    def blur_with(k1d):
        kx = jnp.asarray(k1d)[None, :, None, None]
        ky = jnp.asarray(k1d)[:, None, None, None]
        x = jax.lax.conv_general_dilated(
            images, jnp.tile(ky, (1, 1, 1, c)),
            (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        return jax.lax.conv_general_dilated(
            x, jnp.tile(kx, (1, 1, 1, c)),
            (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    b3 = blur_with(_gauss1d(3))
    b7 = blur_with(_gauss1d(7))
    sel = jnp.where(pick7[:, None, None, None], b7, b3)
    return jnp.where(do[:, None, None, None], sel, images)


def augment_on_the_fly(images, key, blur_prob: float = 0.0):
    """The full label-preserving train-time pipeline (cutout -> salt &
    pepper -> optional blur), one fused jitted program; replaces the
    reference's per-epoch host rewrite of X (`callbacks.py:319-338`).

    blur_prob defaults to 0: the reference's train-time blur is a silent
    no-op (`augmentation.py:66-70` discards the cv2 result), so its
    effective Dataset-A recipe is cutout + salt&pepper only.  Pass
    blur_prob>0 to actually blur (TrainConfig.blur_prob)."""
    k1, k2, k3 = jax.random.split(key, 3)
    images = cutout(images, k1)
    images = salt_and_pepper(images, k2)
    if blur_prob > 0:
        images = random_blur(images, k3, prob=blur_prob)
    return images


#: Standalone jitted entry point (the train step traces the plain fn).
augment_on_the_fly_jit = jax.jit(augment_on_the_fly, donate_argnums=(0,),
                                 static_argnames=("blur_prob",))


# ---------------------------------------------------------------------------
# Label-transforming ops (offline augmentation; raw metadata rows
# [cx, cy, a, b, angle_deg, rings], angle in degrees like the files)
# ---------------------------------------------------------------------------


def _cleanup_angle(angle):
    """Wrap into [0, 180) (reference `cleanup_angle`,
    `augmentation.py:74-79`)."""
    return jnp.mod(angle, 180.0)


def flip_image_and_labels(img, rows, mask, flip_mode: int):
    """flip_mode: 0 = vertical (flip y), 1 = horizontal (flip x),
    -1 = both, -2 = none (reference `flip_image`,
    `augmentation.py:82-112`).  img: (H, W, C); rows: (N, 6) padded;
    mask: (N,) row validity."""
    h, w = img.shape[0], img.shape[1]
    cx, cy, a, b, ang, rings = (rows[:, k] for k in range(6))
    if flip_mode == -2:
        return img, rows
    if flip_mode in (0, -1):
        img = img[::-1, :, :]
        cy = h - cy
        ang = _cleanup_angle(-ang)
    if flip_mode in (1, -1):
        img = img[:, ::-1, :]
        cx = w - cx
        ang = _cleanup_angle(180.0 - ang)
    out = jnp.stack([cx, cy, a, b, ang, rings], axis=1)
    return img, jnp.where(mask[:, None], out, rows)


def _bilinear_sample(img, yq, xq):
    """img (H, W, C); query grids (H, W) -> (H, W, C), zero padded."""
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.floor(yq)
    x0 = jnp.floor(xq)
    wy = yq - y0
    wx = xq - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi = jnp.clip(yi, 0, h - 1)
        xi = jnp.clip(xi, 0, w - 1)
        v = img[yi, xi]
        return jnp.where(valid[..., None], v, 0.0)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    wy = wy[..., None]
    wx = wx[..., None]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def rotate_image_and_labels(img, rows, mask, rot_angle_deg):
    """Rotate about the image center; centers follow the rotation matrix
    and the ellipse angle shifts by rot_angle (reference `rotate_image`,
    `augmentation.py:184-207`; screen-coords convention: cv2's
    getRotationMatrix2D rotates counter-clockwise in image space)."""
    h, w = img.shape[0], img.shape[1]
    cx0, cy0 = w / 2.0, h / 2.0
    th = jnp.deg2rad(rot_angle_deg)
    c, s = jnp.cos(th), jnp.sin(th)

    # inverse map for resampling: dest (x, y) <- src rot^-1
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy0
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx0
    # cv2 rotation matrix M = [[c, s, ...], [-s, c, ...]] (y down);
    # forward: p' = M p  =>  inverse: rotate by -angle
    xsrc = c * xs - s * ys + cx0
    ysrc = s * xs + c * ys + cy0
    out_img = _bilinear_sample(img, ysrc, xsrc)

    cx, cy, a, b, ang, rings = (rows[:, k] for k in range(6))
    dx, dy = cx - cx0, cy - cy0
    ncx = c * dx + s * dy + cx0
    ncy = -s * dx + c * dy + cy0
    nang = _cleanup_angle(ang + rot_angle_deg)
    out = jnp.stack([jnp.round(ncx), jnp.round(ncy), a, b, nang, rings],
                    axis=1)
    return out_img, jnp.where(mask[:, None], out, rows)


def sample_geo_params(
    key,
    b: int,
    rot_max: float = 20.0,
    trans_max: float = 40.0,
    trans_prob: float = 0.9,
    flip_prob: float = 0.75,
):
    """Per-image random transform parameters, matching the reference's
    offline distributions (`augment_preproc.py:74-95`):
      * flip mode uniform over {none, v, h, vh}
        (reference `np.random.choice([-2,-1,0,1])`),
      * rotation angle U(-rot_max, rot_max) degrees,
      * integer translation U(-trans_max, trans_max) applied with prob
        0.9 (reference passes `np.random.randint(10)` as trans_index
        and skips when it lands 0).
    Returns dict(mode, theta, tx, ty), each (b,)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    u_flip = jax.random.uniform(k1, (b,))
    # uniform over the 4 modes when flip_prob=0.75 (mode 0 = none)
    mode = jnp.where(
        u_flip >= flip_prob, 0,
        1 + (u_flip * (3.0 / max(flip_prob, 1e-9))).astype(jnp.int32)
    )
    mode = jnp.clip(mode, 0, 3)
    theta = jax.random.uniform(k2, (b,), minval=-rot_max, maxval=rot_max)
    do_t = jax.random.bernoulli(k3, trans_prob, (b,))
    tx = jnp.round(jax.random.uniform(k4, (b,), minval=-trans_max,
                                      maxval=trans_max)) * do_t
    ty = jnp.round(jax.random.uniform(k5, (b,), minval=-trans_max,
                                      maxval=trans_max)) * do_t
    return {"mode": mode, "theta": theta, "tx": tx, "ty": ty}


def apply_geo_batch(
    images,
    rows,
    mask,
    params,
    img_w: int = 512,
    img_h: int = 384,
    fill: float = -1.0,
):
    """Apply per-image flip+rotate+translate (from `sample_geo_params`
    or hand-built, for tests) as ONE composed affine per image.

    The image is warped with a single bilinear resample; the raw ellipse
    rows are remapped in NATIVE (img_w x img_h) coordinates exactly like
    the reference's flip/rotate/translate label math — when the stored
    frames are resized (Hr, Wr != img_h, img_w), the warp is the native
    affine conjugated into resized space, so image and labels stay
    consistent (an affine maps ellipses to ellipses; rigid in native
    space means semi-axes are untouched).

    images: (B, Hr, Wr, C) float (inception-scaled; `fill` is the
        border value — -1.0 == black, matching cv2's zero border on
        raw pixels).
    rows: (B, N, 6) raw [cx, cy, a, b, angle_deg, rings] in native
        coordinates; mask: (B, N) slot validity.
    Returns (images_aug, rows_aug).
    """
    hr, wr = images.shape[1], images.shape[2]
    mode = params["mode"]
    theta = params["theta"]
    tx = params["tx"]
    ty = params["ty"]

    vflip = (mode == 1) | (mode == 3)
    hflip = (mode == 2) | (mode == 3)
    fx = jnp.where(hflip, -1.0, 1.0)
    ox_f = jnp.where(hflip, float(img_w), 0.0)
    fy = jnp.where(vflip, -1.0, 1.0)
    oy_f = jnp.where(vflip, float(img_h), 0.0)

    th = jnp.deg2rad(theta)
    c, s = jnp.cos(th), jnp.sin(th)
    cx0, cy0 = img_w / 2.0, img_h / 2.0

    # forward native affine p' = A p + o  with A = R diag(fx, fy),
    # o = R (f_off - ctr) + ctr + t ; R = [[c, s], [-s, c]] (cv2's
    # y-down screen convention, like rotate_image_and_labels above)
    a11 = c * fx
    a12 = s * fy
    a21 = -s * fx
    a22 = c * fy
    dox = ox_f - cx0
    doy = oy_f - cy0
    o_x = c * dox + s * doy + cx0 + tx
    o_y = -s * dox + c * doy + cy0 + ty

    # ---- labels (native coords) ----
    cx, cy, aa, bb, ang, rings = (rows[..., k] for k in range(6))
    ncx = a11[:, None] * cx + a12[:, None] * cy + o_x[:, None]
    ncy = a21[:, None] * cx + a22[:, None] * cy + o_y[:, None]
    ang_f = jnp.where(
        mode[:, None] == 1, -ang,
        jnp.where(mode[:, None] == 2, 180.0 - ang,
                  jnp.where(mode[:, None] == 3, 180.0 + ang, ang)),
    )
    nang = _cleanup_angle(ang_f + theta[:, None])
    new_rows = jnp.stack([ncx, ncy, aa, bb, nang, rings], axis=-1)
    new_rows = jnp.where(mask[..., None], new_rows, rows)

    # ---- image warp (resized coords) ----
    # p_src_r = D_n2r . A^-1 . (D_r2n p_dst_r - o); fold the diagonal
    # scale factors into the 2x2 coefficients + offset
    det = a11 * a22 - a12 * a21  # = fx * fy = +/-1
    i11 = a22 / det
    i12 = -a12 / det
    i21 = -a21 / det
    i22 = a11 / det
    sx_r2n = img_w / wr
    sy_r2n = img_h / hr
    # x_src_r = (i11 * sx_r2n * xd + i12 * sy_r2n * yd
    #            - (i11 o_x + i12 o_y)) / sx_r2n  etc.
    c11 = i11
    c12 = i12 * sy_r2n / sx_r2n
    c21 = i21 * sx_r2n / sy_r2n
    c22 = i22
    # offsets in dst resized coords such that
    # x_src = c11 (xd - px) + c12 (yd - py) form needs a common origin;
    # expand instead: x_src = c11 xd + c12 yd + bx
    bx = -(i11 * o_x + i12 * o_y) / sx_r2n
    by = -(i21 * o_x + i22 * o_y) / sy_r2n

    def warp_one(img, c11i, c12i, c21i, c22i, bxi, byi):
        h, w = img.shape[0], img.shape[1]
        yd = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        xd = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        xs = c11i * xd + c12i * yd + bxi
        ys = c21i * xd + c22i * yd + byi
        out = _bilinear_sample(img, ys, xs)
        inb = ((ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1))
        return jnp.where(inb[..., None], out, fill)

    new_images = jax.vmap(warp_one)(images, c11, c12, c21, c22, bx, by)
    return new_images, new_rows


def geo_augment_batch(
    images,
    rows,
    mask,
    key,
    img_w: int = 512,
    img_h: int = 384,
    rot_max: float = 20.0,
    trans_max: float = 40.0,
    trans_prob: float = 0.9,
    flip_prob: float = 0.75,
    fill: float = -1.0,
):
    """Batched train-time geometric augmentation WITH label remap — the
    TPU-first replacement for the reference's offline 42x dataset
    inflation (`augment_preproc.py:74-95`).  Samples per-image flip /
    rotation / translation and applies them as one fused affine; see
    `sample_geo_params` / `apply_geo_batch`."""
    params = sample_geo_params(key, images.shape[0], rot_max, trans_max,
                               trans_prob, flip_prob)
    return apply_geo_batch(images, rows, mask, params, img_w, img_h, fill)


def translate_image_and_labels(img, rows, mask, tx, ty):
    """Shift image by (tx, ty) pixels (zero fill) and move centers
    (reference `translate_image`, `augmentation.py:216-239`,
    trans_max 40)."""
    h, w = img.shape[0], img.shape[1]
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - ty
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - tx
    out_img = _bilinear_sample(img, ys, xs)
    cx, cy, a, b, ang, rings = (rows[:, k] for k in range(6))
    out = jnp.stack([cx + tx, cy + ty, a, b, ang, rings], axis=1)
    return out_img, jnp.where(mask[:, None], out, rows)
