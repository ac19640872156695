"""Pallas TPU kernel: fused +/-45-degree rotation core for the warp path.

The XLA shear path (ops/warp.py) lowers to ~30 full-tensor HBM passes
(8 masked rolls + lerp per shear, 3 shears). This kernel keeps one
(H, W) channel slice resident in VMEM and runs the whole Paeth 3-shear
pipeline + border fill in registers — one HBM read and one write per slice.

Composition order (image ops, matching ops/warp.py semantics):
  forward  augment(deg, flip): rot90-part -> shear kernel -> hflip
  inverse  invert(deg, flip):  hflip -> rot90-part(-deg) -> shear kernel
The exact 90-degree part (transpose+reverse) and the flips are cheap XLA
reversals outside the kernel; flips do NOT commute with rotations, so the
order above is load-bearing.

Grid: one program per (image, channel). A scalar-prefetched per-image table
carries the two shear coefficients; a second prefetch array carries
per-(image, channel) fill values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll_neg(v, s, axis, n):
    """out[i] = v[(i + s) mod n] for per-row/col int32 s (broadcast select
    over binary-decomposed static rolls)."""
    bits = max(1, (n - 1).bit_length())
    for j in range(bits):
        amt = 1 << j
        rolled = pltpu.roll(v, (n - amt) % n, axis=axis)
        bit = ((s >> j) & 1) == 1
        v = jnp.where(bit, rolled, v)
    return v


def _shear_2d(v, lam, axis, fill):
    """1-D bilinear resample of an (H, W) block along ``axis`` with shift
    d = lam * (j - cj) per the other axis j, fill outside the source."""
    h, w = v.shape
    n = v.shape[axis]
    other = 1 - axis
    m = v.shape[other]
    cj = (m - 1) / 2.0
    if other == 0:
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0).astype(jnp.float32)
    else:
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1).astype(jnp.float32)
    d = lam * (j_idx - cj)                      # (H,1) or (1,W)
    k = jnp.floor(d)
    frac = d - k
    kint = k.astype(jnp.int32)
    shift = jnp.mod(kint, n)

    tap0 = _roll_neg(v, shift, axis, n)
    tap1 = pltpu.roll(tap0, n - 1, axis=axis)   # one further +1 shift

    if axis == 0:
        src_pos = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    else:
        src_pos = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    # source index along `axis` is i + k(j); k varies along the OTHER axis,
    # so src_pos (along axis) + kint (along other) broadcasts to (H, W)
    src0 = src_pos + kint
    valid0 = (src0 >= 0) & (src0 <= n - 1)
    valid1 = (src0 + 1 >= 0) & (src0 + 1 <= n - 1)
    return (1.0 - frac) * jnp.where(valid0, tap0, fill) + frac * jnp.where(
        valid1, tap1, fill
    )


def _warp_kernel(scal_ref, fill_ref, img_ref, out_ref):
    b = pl.program_id(0)
    c = pl.program_id(1)
    lam_x = scal_ref[b, 0]
    lam_y = scal_ref[b, 1]
    fill = fill_ref[b, c]

    v = img_ref[0, 0].astype(jnp.float32)       # (H, W)
    v = _shear_2d(v, lam_x, axis=1, fill=fill)
    v = _shear_2d(v, lam_y, axis=0, fill=fill)
    v = _shear_2d(v, lam_x, axis=1, fill=fill)
    out_ref[0, 0] = v


@functools.partial(jax.jit, static_argnames=("interpret",))
def _shear_core(images_bchw, scal, fill, interpret=False):
    """images (B, C, H, W) f32; scal (B, 2) f32; fill (B, C) f32."""
    b, c, h, w = images_bchw.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, c),
        in_specs=[
            pl.BlockSpec((1, 1, h, w), lambda i, j, *_: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, h, w), lambda i, j, *_: (i, j, 0, 0)),
    )
    return pl.pallas_call(
        _warp_kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scal, fill, images_bchw)


def _rot90_select(v_bchw, n90):
    b = v_bchw.shape[0]
    t = jnp.swapaxes(v_bchw, 2, 3)
    pos = t[:, :, ::-1, :]
    neg = t[:, :, :, ::-1]
    sel = n90.reshape(b, 1, 1, 1)
    return jnp.where(sel == 1, pos, jnp.where(sel == -1, neg, v_bchw))


def _hflip_select(v_bchw, hflip):
    sel = hflip.reshape(v_bchw.shape[0], 1, 1, 1) > 0.5
    return jnp.where(sel, v_bchw[:, :, :, ::-1], v_bchw)


def warp_rotate_flip(
    images: jnp.ndarray,
    degrees: jnp.ndarray,
    hflip: jnp.ndarray,
    fill,
    inverse: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused warp equivalent to ops.warp.augment / invert (shear method).

    images (B, H, W, C); degrees/hflip (B,); fill scalar | (C,) | (B, C).
    """
    b, h, w, c = images.shape
    if h != w:
        # the 90-degree composition transposes the canvas; warp.augment /
        # warp.invert route non-square inputs to the gather path instead
        raise ValueError(
            f"warp_rotate_flip needs a square image, got H={h}, W={w}"
        )
    dtype = images.dtype

    deg = degrees.astype(jnp.float32)
    if inverse:
        deg = -deg
    n90 = jnp.where(deg > 45.0, 1, jnp.where(deg < -45.0, -1, 0))
    resid = deg - 90.0 * n90
    rad = jnp.deg2rad(resid)
    scal = jnp.stack([-jnp.tan(rad / 2.0), jnp.sin(rad)], axis=1)

    fill_arr = jnp.asarray(fill, jnp.float32)
    if fill_arr.ndim == 0:
        fill_arr = jnp.broadcast_to(fill_arr, (b, c))
    elif fill_arr.ndim == 1:
        fill_arr = jnp.broadcast_to(fill_arr[None, :], (b, c))

    v = jnp.transpose(images.astype(jnp.float32), (0, 3, 1, 2))  # (B,C,H,W)
    if inverse:
        v = _hflip_select(v, hflip)
        v = _rot90_select(v, n90)
        v = _shear_core(v, scal, fill_arr, interpret=interpret)
    else:
        v = _rot90_select(v, n90)
        v = _shear_core(v, scal, fill_arr, interpret=interpret)
        v = _hflip_select(v, hflip)
    return jnp.transpose(v, (0, 2, 3, 1)).astype(dtype)
