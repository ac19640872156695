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


def augment(
    images: jnp.ndarray,
    degrees: jnp.ndarray,
    hflip: jnp.ndarray,
    fill: jnp.ndarray | float = 0.0,
) -> jnp.ndarray:
    """Forward augmentation: rotate by ``degrees`` then horizontally flip."""
    return sample_affine(images, aug_matrices(degrees, hflip), fill)


def invert(
    maps: jnp.ndarray,
    degrees: jnp.ndarray,
    hflip: jnp.ndarray,
    fill: jnp.ndarray | float = 0.0,
) -> jnp.ndarray:
    """Inverse augmentation applied to predicted maps (un-flip, un-rotate)."""
    return sample_affine(maps, inverse_matrices(degrees, hflip), fill)
