"""Batched on-device affine warps (rotation + horizontal flip).

This replaces two host-side PIL paths in the reference with one vectorized
XLA program:
  * forward augmentation of the TTA views, done per-sample in DataLoader
    workers (/root/reference/datasetchaos_proposed/transform.py:81-106 and
    :16-34), and
  * ``reverseaug`` — the per-image, per-class CPU PIL inverse rotation of
    predicted maps (/root/reference/train_files/
    trainchaos_proposed_30cases1labeled.py:81-95), which forced a
    device->host->device ping-pong for every view of every batch.

Geometry: rotation about the image center with bilinear resampling and a
constant fill outside the source extent, matching PIL's
``Image.rotate(angle, BILINEAR)`` semantics (rotate-then-flip forward,
flip-then-unrotate inverse). Because bilinear warping is a convex
combination of source pixels plus the fill, warping a *normalized* image
with ``fill = (0 - mean) / std`` is exactly equivalent to the reference's
normalize-after-rotate ordering (transform.py:139-172).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rot_mats(degrees: jnp.ndarray, sign: float) -> jnp.ndarray:
    """(B,) degrees -> (B, 2, 2) rotation matrices R_{sign*theta}."""
    rad = jnp.deg2rad(degrees.astype(jnp.float32)) * sign
    c, s = jnp.cos(rad), jnp.sin(rad)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def _flip_mats(hflip: jnp.ndarray) -> jnp.ndarray:
    """(B,) {0,1} -> (B, 2, 2) reflection about the vertical center axis."""
    f = 1.0 - 2.0 * hflip.astype(jnp.float32)  # +1 or -1 on x
    one = jnp.ones_like(f)
    zero = jnp.zeros_like(f)
    return jnp.stack(
        [jnp.stack([f, zero], axis=-1), jnp.stack([zero, one], axis=-1)],
        axis=-2,
    )


def aug_matrices(degrees: jnp.ndarray, hflip: jnp.ndarray) -> jnp.ndarray:
    """Sampling matrices for the forward augmentation flip(rotate(img, d)).

    out(p) = img(M @ p) with M = R_{d} @ F (coords relative to center);
    the sign matches PIL (y-down raster coords make R_{d} the sampling map
    for a visually counter-clockwise rotate(d)).
    """
    return jnp.einsum("bij,bjk->bik", _rot_mats(degrees, 1.0), _flip_mats(hflip))


def inverse_matrices(degrees: jnp.ndarray, hflip: jnp.ndarray) -> jnp.ndarray:
    """Sampling matrices for the inverse rotate(flip(x), -d): M = F @ R_{-d}."""
    return jnp.einsum("bij,bjk->bik", _flip_mats(hflip), _rot_mats(degrees, -1.0))


def sample_affine(
    images: jnp.ndarray,
    mats: jnp.ndarray,
    fill: jnp.ndarray | float = 0.0,
) -> jnp.ndarray:
    """Bilinear-resample a batch through per-image 2x2 center-relative maps.

    Args:
      images: (B, H, W, C) float array.
      mats:   (B, 2, 2) sampling matrices (output coord -> source coord).
      fill:   scalar, (C,), or (B, C) value used outside the source extent.

    Returns (B, H, W, C), same dtype as ``images``.
    """
    b, h, w, c = images.shape
    dtype = images.dtype
    imgs = images.astype(jnp.float32)

    cy = (h - 1) / 2.0
    cx = (w - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32) - cy       # (H,)
    xs = jnp.arange(w, dtype=jnp.float32) - cx       # (W,)
    # source coords: [sx, sy] = M @ [x, y] per output pixel
    gx, gy = jnp.meshgrid(xs, ys)                    # (H, W) each
    grid = jnp.stack([gx, gy], axis=-1)              # (H, W, 2) as (x, y)
    src = jnp.einsum("bij,hwj->bhwi", mats, grid)    # (B, H, W, 2)
    sx = src[..., 0] + cx
    sy = src[..., 1] + cy

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    tx = sx - x0
    ty = sy - y0

    fill_arr = jnp.broadcast_to(
        jnp.asarray(fill, dtype=jnp.float32).reshape((-1, 1, 1, c) if jnp.ndim(fill) == 2 else (1, 1, 1, -1) if jnp.ndim(fill) == 1 else (1, 1, 1, 1)),
        (b, 1, 1, c),
    )

    def corner(xi, yi):
        inside = (
            (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        )
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        # gather per batch element: (B, H, W, C)
        gathered = jax.vmap(lambda im, yy, xx: im[yy, xx])(imgs, yc, xc)
        return jnp.where(inside[..., None], gathered, fill_arr)

    v00 = corner(x0, y0)
    v01 = corner(x0 + 1, y0)
    v10 = corner(x0, y0 + 1)
    v11 = corner(x0 + 1, y0 + 1)

    txe = tx[..., None]
    tye = ty[..., None]
    out = (
        v00 * (1 - txe) * (1 - tye)
        + v01 * txe * (1 - tye)
        + v10 * (1 - txe) * tye
        + v11 * txe * tye
    )
    return out.astype(dtype)


# --------------------- gather-free shear rotation ---------------------
#
# Per-pixel 2-D gathers are the slowest primitive on TPU: the 4-corner
# gather warp above costs ~4x a full FuseUNet forward at the CHAOS operating
# point. The Paeth 3-shear decomposition R(t) = Sx(-tan t/2) Sy(sin t)
# Sx(-tan t/2) turns rotation into three axis-wise 1-D resamples whose
# per-row/column shifts are constants — implementable as log2(N) masked
# jnp.roll passes plus a lerp: pure VPU elementwise/slice work, no gathers.
# Angles beyond +-45 deg compose with an exact 90-degree rotation
# (transpose + reverse). This is the default warp; the gather path above is
# the exactness reference.


def _roll_by(v: jnp.ndarray, shift: jnp.ndarray, axis: int) -> jnp.ndarray:
    """out[..., i, ...] = v[..., (i + shift) mod N, ...] with ``shift`` >= 0
    integer per (batch, other-spatial-axis), via binary-decomposed masked
    rolls. shift: (B, M) where M is the size of the other spatial axis."""
    n = v.shape[axis]
    other = 2 if axis == 1 else 1
    sel_shape = [1] * v.ndim
    sel_shape[0] = v.shape[0]
    sel_shape[other] = v.shape[other]
    bits = max(1, (n - 1).bit_length())
    for j in range(bits):
        bit = ((shift >> j) & 1).astype(bool).reshape(sel_shape)
        rolled = jnp.roll(v, -(1 << j), axis=axis)
        v = jnp.where(bit, rolled, v)
    return v


def _shear(
    v: jnp.ndarray,
    lam: jnp.ndarray,
    axis: int,
    fill: jnp.ndarray,
) -> jnp.ndarray:
    """1-D bilinear resample along ``axis`` with shift d = lam * (j - cj)
    per the OTHER spatial axis j: out[i] = in[i + d], zero-extended with
    ``fill``. v: (B, H, W, C); lam: (B,); fill: (B, 1, 1, C)."""
    b, h, w, c = v.shape
    n = v.shape[axis]
    other = 2 if axis == 1 else 1
    m = v.shape[other]
    cj = (m - 1) / 2.0
    d = lam[:, None] * (jnp.arange(m, dtype=jnp.float32) - cj)  # (B, m)
    k = jnp.floor(d)
    frac = (d - k).astype(v.dtype)
    kint = k.astype(jnp.int32)

    shift0 = jnp.mod(kint, n)
    tap0 = _roll_by(v, shift0, axis)
    tap1 = jnp.roll(tap0, -1, axis=axis)

    # validity of source positions i + k (tap0) and i + k + 1 (tap1)
    pos_shape = [1] * v.ndim
    pos_shape[axis] = n
    pos = jnp.arange(n, dtype=jnp.int32).reshape(pos_shape)
    k_b = kint.reshape([b] + [m if i == other else 1 for i in (1, 2)] + [1])
    src0 = pos + k_b
    valid0 = (src0 >= 0) & (src0 <= n - 1)
    valid1 = (src0 + 1 >= 0) & (src0 + 1 <= n - 1)

    frac_b = frac.reshape([b] + [m if i == other else 1 for i in (1, 2)] + [1])
    out = (1.0 - frac_b) * jnp.where(valid0, tap0, fill) + frac_b * jnp.where(
        valid1, tap1, fill
    )
    return out


def _rot90(v: jnp.ndarray, sign: int) -> jnp.ndarray:
    """Exact 90-degree rotation matching sample_affine(deg=sign*90):
    transpose + reverse (verified against the gather path in tests)."""
    t = jnp.swapaxes(v, 1, 2)
    return t[:, ::-1, :, :] if sign > 0 else t[:, :, ::-1, :]


def _shear_rotate(
    images: jnp.ndarray,
    degrees: jnp.ndarray,
    fill: jnp.ndarray,
) -> jnp.ndarray:
    """Rotate by per-image ``degrees`` (any magnitude <= 135) via 90-degree
    composition + Paeth shears."""
    b = images.shape[0]
    deg = degrees.astype(jnp.float32)
    n90 = jnp.where(deg > 45.0, 1, jnp.where(deg < -45.0, -1, 0))
    resid = deg - 90.0 * n90

    # apply the exact 90-degree part first (both variants + select)
    pos = _rot90(images, +1)
    neg = _rot90(images, -1)
    sel = n90.reshape(b, 1, 1, 1)
    v = jnp.where(sel == 1, pos, jnp.where(sel == -1, neg, images))

    rad = jnp.deg2rad(resid)
    lam_x = -jnp.tan(rad / 2.0)
    lam_y = jnp.sin(rad)
    v = _shear(v, lam_x, axis=2, fill=fill)
    v = _shear(v, lam_y, axis=1, fill=fill)
    v = _shear(v, lam_x, axis=2, fill=fill)
    return v


def _hflip_select(v: jnp.ndarray, hflip: jnp.ndarray) -> jnp.ndarray:
    sel = hflip.reshape(v.shape[0], 1, 1, 1) > 0.5
    return jnp.where(sel, v[:, :, ::-1, :], v)


def _fill_arr(fill, b: int, c: int, dtype) -> jnp.ndarray:
    f = jnp.asarray(fill, dtype=jnp.float32)
    if f.ndim == 2:
        f = f.reshape(b, 1, 1, c)
    elif f.ndim == 1:
        f = f.reshape(1, 1, 1, c)
    else:
        f = f.reshape(1, 1, 1, 1)
    return jnp.broadcast_to(f, (b, 1, 1, c)).astype(dtype)


def _resolve_method(method: str, shape=None) -> str:
    """'auto' -> the fused Pallas kernel on TPU, the XLA shear path on CPU
    (where the kernel would only run interpreted).

    Non-square images route to the gather path: the 3-shear formulation
    composes rotations > 45 degrees from an exact 90-degree rotation, which
    transposes the canvas — only a square canvas keeps the batch shape
    static. Every shipped task is square; this keeps the API total."""
    if method not in ("auto", "pallas", "shear", "gather"):
        # an unknown string would silently fall through augment/invert's
        # if-chain to the shear path — e.g. an exactness A/B typo'd as
        # 'gahter' would compare shear against itself
        raise ValueError(
            f"warp method must be auto|pallas|shear|gather, got {method!r}"
        )
    if shape is not None and shape[1] != shape[2] and method != "gather":
        return "gather"
    if method != "auto":
        return method
    return "pallas" if jax.default_backend() != "cpu" else "shear"


def augment(
    images: jnp.ndarray,
    degrees: jnp.ndarray,
    hflip: jnp.ndarray,
    fill: jnp.ndarray | float = 0.0,
    method: str = "auto",
) -> jnp.ndarray:
    """Forward augmentation: rotate by ``degrees`` then horizontally flip."""
    method = _resolve_method(method, images.shape)
    if method == "gather":
        return sample_affine(images, aug_matrices(degrees, hflip), fill)
    if method == "pallas":
        from aide_tpu.ops.pallas_warp import warp_rotate_flip

        return warp_rotate_flip(images, degrees, hflip, fill, inverse=False)
    b, _, _, c = images.shape
    dtype = images.dtype
    v = images.astype(jnp.float32)
    v = _shear_rotate(v, degrees, _fill_arr(fill, b, c, jnp.float32))
    return _hflip_select(v, hflip).astype(dtype)


def invert(
    maps: jnp.ndarray,
    degrees: jnp.ndarray,
    hflip: jnp.ndarray,
    fill: jnp.ndarray | float = 0.0,
    method: str = "auto",
) -> jnp.ndarray:
    """Inverse augmentation applied to predicted maps (un-flip, un-rotate)."""
    method = _resolve_method(method, maps.shape)
    if method == "gather":
        return sample_affine(maps, inverse_matrices(degrees, hflip), fill)
    if method == "pallas":
        from aide_tpu.ops.pallas_warp import warp_rotate_flip

        return warp_rotate_flip(maps, degrees, hflip, fill, inverse=True)
    b, _, _, c = maps.shape
    dtype = maps.dtype
    v = _hflip_select(maps.astype(jnp.float32), hflip)
    v = _shear_rotate(v, -degrees, _fill_arr(fill, b, c, jnp.float32))
    return v.astype(dtype)
