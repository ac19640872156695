"""Lane-dense "packed" (space-to-depth) execution of FuseUNet.

Round-3 profiling showed ~70% of the co-teaching step living in the
narrow-channel stages of the width-32 FuseUNet: at 256px the C=32/C=64
tensors fill only 32/64 of the TPU's 128 vector lanes, so every
elementwise/BN op runs at ~25-50% of HBM bandwidth, and the convolutions
use a fraction of the MXU's 128 output columns (measured: relu/BN fusions
151-207 GB/s, 3x3 C32 conv 18 TFLOP/s vs 58 TFLOP/s for the equivalent
lane-dense structured conv — experiments/s2d_probe2.py; per-stage A/B in
the profile: block1 48.1 -> 15.3 ms under packing).

This module executes the two full-resolution stages in a space-to-depth
representation, CHANNEL-MAJOR over phases:

  (B, H, W, C)  ->  (B, H/2, W/2, C*4)    [slot c*4 + (py*2+px)]

so the channel (lane) dimension is always >= 128 AND fusion concats stay
flat last-axis concats (phase-major interleaving measured as a 3.2 ms
materialized pass; channel-major concat fuses into the consuming conv).

The 3x3 convolutions become small block-space convolutions over the packed
tensor whose big kernel is BUILT on the fly from the ORIGINAL
(3,3,Cin,Cout) parameters via a constant 0/1 placement tensor — parameter
tree, initialization, and math are identical to the plain model (autodiff
maps gradients back through the placement einsum onto the original
kernel). Three conv shapes appear:

  * aligned-packed -> offset-packed : 2x2 block kernel (ConvBlock's Conv_0;
    the offset grid covers pixels (2z-1, 2z) with one extra block per dim
    so the 3x3 window never crosses backwards over a block boundary)
  * offset-packed -> aligned-packed : 2x2 block kernel (Conv_1) — the two
    convs of a ConvBlock alternate representations with NO shift pass
  * plain -> aligned-packed         : stride-2 4x4 kernel (up_block4's
    UpsampleConv conv consumes the plain bilinear-resize output directly,
    so no pack transpose is ever materialized)

The two phantom slots per offset dim (pixels -1 and H) are masked to zero
(= the plain conv's SAME zero padding) and excluded from normalization
statistics via an explicit divisor. Packed norms use float32-ACCUMULATING
reductions (jnp.sum(..., dtype=f32)) rather than materialized converts —
a materialized (B,H',W',PC) float32 copy measured 3-5 ms per norm.

Packed stages (base width w): encoder level 1 (C=w @ full res) and decoder
up_block4 (C=2w @ full res). Encoder level 2 measured NO win packed (its
convs already batch both vmapped nets into the MXU columns) and runs plain,
as do all deeper levels. Pooling of packed outputs is a phase-group max
(exactly the 2x2 window); the 1x1 head runs packed (block-diagonal).

Everything here is numerically the plain FuseUNet (same variables, same
outputs to float tolerance) — pinned by tests/test_packed.py.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from aide_tpu.models import blocks
from aide_tpu.models.blocks import ConvBlock, UpBlock, max_pool_2x2, maybe_remat

Dtype = Any


# ----------------------- placement machinery -----------------------


@lru_cache(maxsize=None)
def _dim_map(k: int, pad: int, r_in: int, o_in: int, r_out: int, o_out: int):
    """Per-dimension tap placement for a structured conv.

    Output block b_out, phase p needs input pixel r_out*b_out + o_out + p
    + t - pad = r_in*(s*b_out + d) + o_in + q with s = r_out // r_in.
    Returns (tap_map (k, K, r_in, r_out) [t, T, q, p], d_min, K, s)."""
    assert r_out % r_in == 0
    s = r_out // r_in
    entries = []
    for p in range(r_out):
        for t in range(k):
            val = (o_out - o_in) + p + t - pad
            q = val % r_in
            d = (val - q) // r_in
            entries.append((t, d, q, p))
    d_min = min(e[1] for e in entries)
    d_max = max(e[1] for e in entries)
    K = d_max - d_min + 1
    m = np.zeros((k, K, r_in, r_out), np.float32)
    for t, d, q, p in entries:
        m[t, d - d_min, q, p] = 1.0
    return m, d_min, K, s


@lru_cache(maxsize=None)
def _placement(kh: int, kw: int, pad: int,
               rin: Tuple[int, int], rout: Tuple[int, int],
               o_in: Tuple[int, int], o_out: Tuple[int, int]):
    """Full placement tensor M (kh, kw, KY, KX, Pin, Pout) with phases
    flattened row-major (p = py*rw + px), plus per-dim (pad_lo, K, stride)."""
    mh, dy_min, KY, sy = _dim_map(kh, pad, rin[0], o_in[0], rout[0], o_out[0])
    mw, dx_min, KX, sx = _dim_map(kw, pad, rin[1], o_in[1], rout[1], o_out[1])
    Pin = rin[0] * rin[1]
    Pout = rout[0] * rout[1]
    M = np.zeros((kh, kw, KY, KX, Pin, Pout), np.float32)
    for ty in range(kh):
        for TY in range(KY):
            for qy in range(rin[0]):
                for py in range(rout[0]):
                    if mh[ty, TY, qy, py] == 0:
                        continue
                    for tx in range(kw):
                        for TX in range(KX):
                            for qx in range(rin[1]):
                                for px in range(rout[1]):
                                    if mw[tx, TX, qx, px] == 0:
                                        continue
                                    M[ty, tx, TY, TX,
                                      qy * rin[1] + qx,
                                      py * rout[1] + px] = 1.0
    return M, (-dy_min, KY, sy), (-dx_min, KX, sx)


def struct_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,           # original (kh, kw, Cin, Cout), fp32 param
    bias: Optional[jnp.ndarray],   # (Cout,)
    rin: Tuple[int, int], rout: Tuple[int, int],
    o_in: Tuple[int, int], o_out: Tuple[int, int],
    grid_out: Tuple[int, int],     # output block-grid (Hb_out, Wb_out)
    dtype: Dtype,
    pad: int = 1,
) -> jnp.ndarray:
    """The original SAME conv, executed as one block-space conv over
    channel-major packed tensors. x: (B, Hb, Wb, Cin*Pin) (Pin == 1 for a
    plain input); returns (B, Hb', Wb', Cout*Pout)."""
    kh, kw, cin, cout = kernel.shape
    Pin = rin[0] * rin[1]
    Pout = rout[0] * rout[1]
    M, (pad_lo_y, KY, sy), (pad_lo_x, KX, sx) = _placement(
        kh, kw, pad, rin, rout, o_in, o_out
    )
    # channel-major flatten: input slot i*Pin + q, output slot o*Pout + p
    big = jnp.einsum(
        "abio,abyxpq->yxipoq",
        kernel.astype(dtype),
        jnp.asarray(M, dtype),
    ).reshape(KY, KX, Pin * cin, Pout * cout)

    hb_in, wb_in = x.shape[1], x.shape[2]
    pad_hi_y = (grid_out[0] - 1) * sy + KY - hb_in - pad_lo_y
    pad_hi_x = (grid_out[1] - 1) * sx + KX - wb_in - pad_lo_x
    if (
        KY == KX == 1
        and (sy, sx) == (1, 1)
        and (pad_lo_y, pad_hi_y, pad_lo_x, pad_hi_x) == (0, 0, 0, 0)
    ):
        # pointwise block conv (the 1x1 head): emit as a dot — a vmapped
        # 1x1 lax.conv whose operands are sharded over the vmap (net) axis
        # miscompiles in the SPMD partitioner (see blocks.Conv1x1)
        y = jnp.einsum("bhwi,io->bhwo", x.astype(dtype), big[0, 0])
    else:
        dn = jax.lax.conv_dimension_numbers(
            x.shape, big.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), big, (sy, sx),
            ((pad_lo_y, pad_hi_y), (pad_lo_x, pad_hi_x)),
            dimension_numbers=dn,
        )
    if bias is not None:
        y = y + jnp.repeat(bias.astype(dtype), Pout)
    return y


# ----------------------- fused bilinear-upsample conv -----------------------
#
# UpsampleConv's resize is LINEAR, so conv3x3(upsample2x(x)) collapses into
# ONE conv that reads the half-res input directly and emits the aligned
# (2, 2)-packed output. jax.image.resize(2x, bilinear, half-pixel centers)
# is, per dimension, with xt = edge-pad(x, 1):
#
#   up[2k]   = 0.25*xt[k-1] + 0.75*xt[k]
#   up[2k+1] = 0.75*xt[k]   + 0.25*xt[k+1]
#
# (verified exact to 1e-15 in float64 against jax.image.resize). Folding
# these weights into the 3x3 kernel gives a dense 3x3 block conv over the
# edge-padded half-res input — 9/16 the MAC count of the stride-2 4x4
# structured conv over the materialized full-res resize it replaces, and
# the resize (two dot_generals + a layout copy each way, fwd and bwd)
# disappears entirely. The conv3x3's SAME zero padding lives on the
# FULL-RES grid, which no half-res padding can express, so the four edge
# rows/cols of the output get explicit 1-D correction convs (+ rank-0
# corner add-backs by inclusion-exclusion).

# Default OFF: A/B on the v5e chip (both orders, experiments/packed_ab.py)
# measured the fused path ~3.8% SLOWER for the whole co-teach step (unfused
# 153.2-153.3 ms vs fused 158.8-159.1 ms). The up-block is HBM-bound, so
# the 9/16 MAC saving buys nothing, while the edge-correction convs (four
# 1-D convs + corner terms per call) break XLA's fusion around the block.
# The algebra is exact (float64 pin in tests/test_packed.py) and kept for
# layouts where the resize's extra HBM round-trip dominates.
FUSE_UPSAMPLE = False

# Fence the packed block outputs with jax.lax.optimization_barrier. A
# fusion-context miscompile workaround: the supervised packed bf16 step
# NaN'd modal2_block1's ENTIRE gradient on real-CHAOS batches at batch 4
# on the chip, while the mathematically identical computation is clean in
# isolation, on CPU, in f32, in the plain layout, and at batch 8
# (experiments/naive_nan_probe{,2,3,4}.py) — the signature of an XLA
# fusion bug, not numerics. The barrier stops backward fusions from
# crossing the block boundary; probe4 measured it curing all 8 non-finite
# gradient leaves with a bit-identical forward loss. Wired to
# ModelConfig.packed_block_barrier via the model attributes; this module
# global is a probe/debug override OR'd with the attribute.
BLOCK_BARRIER = False

# Probe/debug refinement of the fence's SCOPE: when not None, the barrier
# (however enabled) applies only to PackedConvBlocks whose module name is
# in this set (FuseUNet names: modal1_block1 / modal2_block1 / up_block4's
# inner "ConvBlock_0") — used by experiments/naive_nan_probe5.py to bisect
# which fence the miscompile actually needs. None = fence every block.
BLOCK_BARRIER_ONLY = None


def _up4_barrier(enabled: bool, scope: str) -> bool:
    """Whether up_block4's conv block gets the fence under ``scope``.

    The probe5 bisect showed the miscompile needs only the encoder
    block-1 fence (fencing modal2_block1 alone cures all 8 non-finite
    gradient leaves; fencing up_block4 alone cures none), so the default
    scope "encoder" leaves the decoder's largest packed activation fully
    fusible. "all" restores the round-5 pre-bisect fence-everything
    behavior."""
    if scope not in ("encoder", "all"):
        raise ValueError(
            f"unknown packed_block_barrier_scope {scope!r}; "
            "expected 'encoder' or 'all'"
        )
    return enabled and scope == "all"


@lru_cache(maxsize=None)
def _up_tap_table() -> np.ndarray:
    """w[t, T, p]: weight with which original 3-tap index t (0..2 for
    offsets -1..1 on the full-res grid) lands on half-res tap T (0..2 for
    block offsets -1..1 over the edge-padded input) for output phase p."""
    w = np.zeros((3, 3, 2), np.float32)
    # phase 0 (even output pixel j=2b): taps hit up[2b-1], up[2b], up[2b+1]
    w[0, 0, 0] = 0.75
    w[1, 0, 0] = 0.25
    w[0, 1, 0] = 0.25
    w[1, 1, 0] = 0.75
    w[2, 1, 0] = 0.75
    w[2, 2, 0] = 0.25
    # phase 1 (odd output pixel j=2b+1): taps hit up[2b], up[2b+1], up[2b+2]
    w[0, 0, 1] = 0.25
    w[0, 1, 1] = 0.75
    w[1, 1, 1] = 0.75
    w[2, 1, 1] = 0.25
    w[1, 2, 1] = 0.25
    w[2, 2, 1] = 0.75
    return w


@lru_cache(maxsize=None)
def _up_placement_2d() -> np.ndarray:
    """M[ty, tx, Ty, Tx, p] with p = py*2 + px flattened row-major."""
    w = _up_tap_table()
    return np.einsum("yYa,xXb->yxYXab", w, w).reshape(3, 3, 3, 3, 4)


def _edge_conv(row, kernel, dtype):
    """1-D valid conv of (B, L+2, Cin) with (3, Cin, Cout2) -> (B, L, Cout2)."""
    x = row[:, None].astype(dtype)                       # (B, 1, L+2, Cin)
    k = kernel[None].astype(dtype)                       # (1, 3, Cin, Cout2)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((0, 0), (0, 0)), dimension_numbers=dn
    )[:, 0]


def upsample_struct_conv(
    x: jnp.ndarray,                # (B, N, M, Cin) half-res plain input
    kernel: jnp.ndarray,           # original (3, 3, Cin, Cout) fp32 param
    bias: Optional[jnp.ndarray],
    dtype: Dtype,
) -> jnp.ndarray:
    """conv3x3_SAME(upsample2x_bilinear(x)) emitted directly as the aligned
    channel-major packed tensor (B, N, M, Cout*4) — the resize is folded
    into the conv kernel (module comment above). Numerically identical to
    the two-step path (float64-exact; pinned by tests/test_packed.py)."""
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3)
    B, N, M, _ = x.shape
    M2 = jnp.asarray(_up_placement_2d(), dtype)
    big = jnp.einsum(
        "abio,abyxp->yxiop", kernel.astype(dtype), M2
    ).reshape(3, 3, cin, cout * 4)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    dn = jax.lax.conv_dimension_numbers(
        xp.shape, big.shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        xp.astype(dtype), big, (1, 1), ((0, 0), (0, 0)), dimension_numbers=dn
    )

    # ---- full-res zero-padding corrections on the four output edges ----
    # The interior kernel assumes every full-res tap is in-image; the taps
    # the SAME conv zero-drops live at full-res rows/cols -1 and 2N/2M and
    # are reached only from (block 0, phase 0, t=-1) / (block last, phase 1,
    # t=+1) per dim. Each dropped contribution is a 1-D composed conv of a
    # single edge row/col of x; the four ring corners are subtracted by both
    # adjacent strips and get added back once (inclusion-exclusion).
    w = jnp.asarray(_up_tap_table(), dtype)
    kd = kernel.astype(dtype)

    def strip_kernel(k1d):                       # (3, Cin, Cout) 1-D taps
        return jnp.einsum("tio,tTp->Tiop", k1d, w).reshape(3, cin, cout * 2)

    c_top = _edge_conv(xp[:, 1, :, :], strip_kernel(kd[0]), dtype)
    c_bot = _edge_conv(xp[:, -2, :, :], strip_kernel(kd[2]), dtype)
    c_left = _edge_conv(xp[:, :, 1, :], strip_kernel(kd[:, 0]), dtype)
    c_right = _edge_conv(xp[:, :, -2, :], strip_kernel(kd[:, 2]), dtype)

    y6 = y.reshape(B, N, M, cout, 2, 2)          # (..., c, py, px)
    y6 = y6.at[:, 0, :, :, 0, :].add(-c_top.reshape(B, M, cout, 2))
    y6 = y6.at[:, -1, :, :, 1, :].add(-c_bot.reshape(B, M, cout, 2))
    y6 = y6.at[:, :, 0, :, :, 0].add(-c_left.reshape(B, N, cout, 2))
    y6 = y6.at[:, :, -1, :, :, 1].add(-c_right.reshape(B, N, cout, 2))

    xe = x.astype(dtype)
    y6 = y6.at[:, 0, 0, :, 0, 0].add(xe[:, 0, 0] @ kd[0, 0])
    y6 = y6.at[:, 0, -1, :, 0, 1].add(xe[:, 0, -1] @ kd[0, 2])
    y6 = y6.at[:, -1, 0, :, 1, 0].add(xe[:, -1, 0] @ kd[2, 0])
    y6 = y6.at[:, -1, -1, :, 1, 1].add(xe[:, -1, -1] @ kd[2, 2])
    y = y6.reshape(B, N, M, cout * 4)

    if bias is not None:
        y = y + jnp.repeat(bias.astype(dtype), 4)
    return y


@lru_cache(maxsize=None)
def _phase_mask(hb: int, wb: int, rh: int, rw: int, oy: int, ox: int,
                h: int, w: int):
    """(1, hb, wb, 1, P) float mask of in-image slots in the channel-major
    (B, Hb, Wb, C, P) view (pixel = r*b + o + p valid iff 0 <= pixel <
    extent)."""
    m = np.zeros((hb, wb, rh, rw), np.float32)
    for by in range(hb):
        for py in range(rh):
            yy = rh * by + oy + py
            if not (0 <= yy < h):
                continue
            for bx in range(wb):
                for px in range(rw):
                    xx = rw * bx + ox + px
                    if 0 <= xx < w:
                        m[by, bx, py, px] = 1.0
    return m.reshape(1, hb, wb, 1, rh * rw)


def pack(x: jnp.ndarray, rh: int, rw: int) -> jnp.ndarray:
    """(B, H, W, C) -> aligned packed (B, H/rh, W/rw, C*P), channel-major
    (slot c*P + py*rw + px)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // rh, rh, w // rw, rw, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // rh, w // rw, c * rh * rw)


def unpack(x: jnp.ndarray, rh: int, rw: int) -> jnp.ndarray:
    b, hb, wb, pc = x.shape
    c = pc // (rh * rw)
    x = x.reshape(b, hb, wb, c, rh, rw)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, hb * rh, wb * rw, c)


def phase_pool(x: jnp.ndarray, c: int) -> jnp.ndarray:
    """2x2 max pool of the underlying image == max over the phase group of
    an ALIGNED (2, 2)-packed tensor. Returns the plain half-res tensor."""
    b, hb, wb, pc = x.shape
    assert pc == 4 * c
    return jnp.max(x.reshape(b, hb, wb, c, 4), axis=-1)


# ----------------------- packed parameter modules -----------------------


class _ConvParams(nn.Module):
    """Declares the SAME parameters nn.Conv would (kernel/bias) without its
    forward — the packed path consumes them via struct_conv."""

    kh: int
    kw: int
    cin: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kh, self.kw, self.cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        return kernel, bias


class _PackedBatchNorm(nn.Module):
    """flax.linen.BatchNorm semantics (momentum 0.9, eps 1e-5, float32
    statistics) over the channel-major (B, Hb, Wb, C, P) view, with an
    explicit valid-pixel mask/divisor so offset-grid phantom slots never
    contaminate the statistics. Reductions ACCUMULATE in float32 directly
    from the compute dtype — a materialized float32 copy of the activation
    measured 3-5 ms per norm at the bench operating point."""

    features: int
    dtype: Dtype

    @nn.compact
    def __call__(self, x5, mask, count, train: bool):
        c = self.features
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (c,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (c,)
        )
        axes = (0, 1, 2, 4)
        xm = x5 if mask is None else x5 * mask.astype(x5.dtype)
        # stats accumulate in float32 OR the input dtype if wider (the f64
        # exactness harness relies on the promotion)
        sdt = jnp.promote_types(x5.dtype, jnp.float32)
        if train:
            mean = jnp.sum(xm, axis=axes, dtype=sdt) / count
            s2 = jnp.sum(jnp.square(xm.astype(sdt)), axis=axes)
            # E[x^2] - E[x]^2 cancels catastrophically on near-constant
            # channels with a large mean (real MRI backgrounds): in float32
            # the difference can come out BELOW -eps, and rsqrt(var + eps)
            # then yields NaN — measured on the chip as an instant
            # first-step NaN of the supervised bf16 packed step on real
            # CHAOS data (experiments/naive_nan_probe.py: bf16_packed NaN
            # at step 1; bf16_plain and f32_packed clean). Variance is
            # mathematically nonnegative; the clamp removes only rounding
            # error.
            var = jnp.maximum(s2 / count - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                ra_var.value = 0.9 * ra_var.value + 0.1 * var
        else:
            mean, var = ra_mean.value, ra_var.value
        mul = jax.lax.rsqrt(var + 1e-5) * scale
        ndt = jnp.promote_types(x5.dtype, jnp.float32)
        y = x5.astype(ndt) * mul[:, None] + (bias - mean * mul)[:, None]
        return y.astype(self.dtype)


class _PackedGroupNorm(nn.Module):
    """flax.linen.GroupNorm semantics (eps 1e-6, per-sample stats over
    spatial dims + channels-in-group) on the channel-major packed view."""

    features: int
    groups: int
    dtype: Dtype

    @nn.compact
    def __call__(self, x5, mask, count, train: bool):
        c = self.features
        g = min(self.groups, c)
        while c % g != 0:
            g -= 1
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        b, hb, wb, _, p = x5.shape
        xm = x5 if mask is None else x5 * mask.astype(x5.dtype)
        xg = xm.reshape(b, hb, wb, g, c // g, p)
        n = (count / b) * (c // g)
        axes = (1, 2, 4, 5)
        sdt = jnp.promote_types(x5.dtype, jnp.float32)
        mean = jnp.sum(xg, axis=axes, dtype=sdt) / n                # (b, g)
        s2 = jnp.sum(jnp.square(xg.astype(sdt)), axis=axes)
        # clamp: E[x^2]-E[x]^2 cancellation can go below -eps on
        # near-constant groups (see _PackedBatchNorm; eps here is 1e-6,
        # even tighter)
        var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
        mul = jax.lax.rsqrt(var + 1e-6)                             # (b, g)
        mulc = jnp.repeat(mul, c // g, axis=1) * scale              # (b, c)
        addc = bias - jnp.repeat(mean * mul, c // g, axis=1) * scale
        y = (
            x5.astype(sdt) * mulc[:, None, None, :, None]
            + addc[:, None, None, :, None]
        )
        return y.astype(self.dtype)


class PackedNorm(nn.Module):
    """Packed counterpart of blocks.Norm: same child names (BatchNorm_0 /
    GroupNorm_0) so variable trees interchange with the plain model."""

    kind: str
    groups: int
    features: int
    dtype: Dtype

    @nn.compact
    def __call__(self, x5, mask, count, train: bool):
        if self.kind == "batch":
            return _PackedBatchNorm(
                self.features, self.dtype, name="BatchNorm_0"
            )(x5, mask, count, train)
        if self.kind == "group":
            return _PackedGroupNorm(
                self.features, self.groups, self.dtype, name="GroupNorm_0"
            )(x5, mask, count, train)
        raise ValueError(f"unknown norm kind {self.kind!r}")


class PackedConvBlock(nn.Module):
    """ConvBlock (two conv3x3 -> norm -> relu) on (2, 2)-packed tensors.

    Input/output are ALIGNED packed grids; the intermediate after Conv_0
    lives on the OFFSET grid (one extra block per dim) so both convs are
    exact single 2x2 block convolutions. Variable tree == plain ConvBlock
    (Conv_0, Norm_0/..., Conv_1, Norm_1/...)."""

    features: int
    cin: int
    h: int                 # pixel extent of this stage
    w: int
    norm: str = "batch"
    groups: int = 8
    dtype: Dtype = jnp.bfloat16
    block_barrier: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        hb, wb = self.h // 2, self.w // 2
        mask = jnp.asarray(
            _phase_mask(hb + 1, wb + 1, 2, 2, -1, -1, self.h, self.w),
            jnp.float32,
        )

        def norm_relu_mask(y, name, masked):
            b = y.shape[0]
            cnt = b * self.h * self.w
            c = self.features
            y5 = y.reshape(y.shape[:3] + (c, 4))
            y5 = PackedNorm(self.norm, self.groups, c, self.dtype, name=name)(
                y5, mask if masked else None, cnt, train
            )
            y5 = nn.relu(y5)
            if masked:
                # phantom slots must be exactly the plain conv's zero padding
                y5 = y5 * mask.astype(y5.dtype)
            return y5.reshape(y.shape[:3] + (c * 4,))

        k1, b1 = _ConvParams(3, 3, self.cin, self.features, name="Conv_0")()
        y = struct_conv(
            x, k1, b1, (2, 2), (2, 2), (0, 0), (-1, -1),
            (hb + 1, wb + 1), self.dtype,
        )
        y = norm_relu_mask(y, "Norm_0", masked=True)
        k2, b2 = _ConvParams(3, 3, self.features, self.features, name="Conv_1")()
        y = struct_conv(
            y, k2, b2, (2, 2), (2, 2), (-1, -1), (0, 0), (hb, wb), self.dtype
        )
        y = norm_relu_mask(y, "Norm_1", masked=False)
        if (self.block_barrier or BLOCK_BARRIER) and (
            BLOCK_BARRIER_ONLY is None or self.name in BLOCK_BARRIER_ONLY
        ):
            y = jax.lax.optimization_barrier(y)
        return y


class _PackedUpsampleConv(nn.Module):
    """UpsampleConv emitted as ONE conv: the bilinear 2x resize is linear,
    so it folds into the 3x3 kernel (upsample_struct_conv) — the conv reads
    the half-res input directly and emits the aligned packed grid with no
    full-res resize materialized, at 9/16 the MACs of the stride-2 4x4
    structured conv over the resize it replaces. Norm+relu run lane-dense
    on the packed output (per-channel norms commute with packing exactly).
    Variable tree == plain UpsampleConv (Conv_0, Norm_0/...)."""

    features: int
    h: int
    w: int
    norm: str = "batch"
    groups: int = 8
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = self.features
        k, b = _ConvParams(3, 3, x.shape[-1], f, name="Conv_0")()
        if FUSE_UPSAMPLE:
            y = upsample_struct_conv(x, k, b, self.dtype)
        else:
            up = blocks.upsample2x_bilinear(x.astype(self.dtype))
            y = struct_conv(
                up, k, b, (1, 1), (2, 2), (0, 0), (0, 0),
                (self.h // 2, self.w // 2), self.dtype,
            )
        y5 = y.reshape(y.shape[:3] + (f, 4))
        y5 = PackedNorm(self.norm, self.groups, f, self.dtype, name="Norm_0")(
            y5, None, y.shape[0] * self.h * self.w, train
        )
        return nn.relu(y5)  # (B, H/2, W/2, f, 4)


class _PackedUpBlock4(nn.Module):
    """UpBlock at full resolution, fully packed. Variable tree == plain
    UpBlock (UpsampleConv_0, ConvBlock_0)."""

    features: int          # 2w
    h: int
    w: int
    learned_bilinear: bool = False
    norm: str = "batch"
    groups: int = 8
    dtype: Dtype = jnp.bfloat16
    remat: bool = False
    block_barrier: bool = False

    @nn.compact
    def __call__(self, skip_packed, x, train: bool = True):
        f = self.features
        if self.learned_bilinear:
            raise NotImplementedError(
                "packed layout supports resize+conv upsampling only"
            )
        y5 = _PackedUpsampleConv(
            f, self.h, self.w, self.norm, self.groups, self.dtype,
            name="UpsampleConv_0",
        )(x, train)
        y = y5.reshape(y5.shape[:3] + (f * 4,))
        # channel-major packing makes the fusion concat a FLAT last-axis
        # concat (fuses into the consuming conv's input fetch)
        fused = jnp.concatenate([y, skip_packed], axis=-1)
        Block = maybe_remat(PackedConvBlock, self.remat, 2)
        return Block(
            f, 2 * f, self.h, self.w,
            norm=self.norm, groups=self.groups, dtype=self.dtype,
            block_barrier=self.block_barrier, name="ConvBlock_0",
        )(fused, train)


# ----------------------- the packed FuseUNet -----------------------


class PackedFuseUNet(nn.Module):
    """FuseUNet (variant='plain') with lane-dense packed narrow stages.

    Variable tree is IDENTICAL to models.fuseunet.FuseUNet — checkpoints,
    warm starts and .pkl interop are interchangeable; only the execution
    layout differs. Levels 2-5 and up_block1-3 run the plain modules."""

    num_classes: int = 2
    base_width: int = 32
    learned_bilinear: bool = False
    norm: str = "batch"
    group_norm_groups: int = 8
    axis_name: Optional[str] = None
    compute_dtype: str = "bfloat16"
    remat: bool = False
    block_barrier: bool = False
    barrier_scope: str = "encoder"  # encoder | all (see _up4_barrier)

    @nn.compact
    def __call__(self, modal1, modal2, train: bool = True):
        dtype = blocks.resolve_dtype(self.compute_dtype)
        w = self.base_width
        widths = [w, 2 * w, 4 * w, 8 * w, 16 * w]
        common = dict(
            norm=self.norm,
            groups=self.group_norm_groups,
            axis_name=self.axis_name,
            dtype=dtype,
        )
        pcommon = dict(norm=self.norm, groups=self.group_norm_groups, dtype=dtype,
                       block_barrier=self.block_barrier)
        PBlock = maybe_remat(PackedConvBlock, self.remat, 2)
        Block = maybe_remat(ConvBlock, self.remat, 2)
        Up = maybe_remat(UpBlock, self.remat, 3)
        B, H, W, _ = modal1.shape
        if H % 16 or W % 16:
            raise ValueError("PackedFuseUNet needs H, W divisible by 16")

        m1 = pack(modal1.astype(dtype), 2, 2)   # (B, H/2, W/2, cin*4)
        m2 = pack(modal2.astype(dtype), 2, 2)

        # ---- level 1 (C=w @ full res): packed ----
        # cin inferred from the input, like plain nn.Conv does
        y1 = PBlock(w, modal1.shape[-1], H, W, name="modal1_block1",
                    **pcommon)(m1, train)
        x1 = PBlock(w, modal2.shape[-1], H, W, name="modal2_block1",
                    **pcommon)(m2, train)
        f1p = jnp.concatenate([y1, x1], axis=-1)   # packed, channels (2w)*4

        # ---- levels 2-5: plain modules (level 2 measured no win packed) ----
        y = phase_pool(f1p, 2 * w)
        x = phase_pool(x1, w)
        fused = [f1p]                              # level-1 skip stays packed
        for level in (1, 2, 3, 4):
            feats = widths[level]
            if level > 1:
                y = max_pool_2x2(fused[-1])
                x = max_pool_2x2(x)
            y = Block(feats, name=f"modal1_block{level + 1}", **common)(y, train)
            x = Block(feats, name=f"modal2_block{level + 1}", **common)(x, train)
            fused.append(jnp.concatenate([y, x], axis=-1))

        out = fused[-1]
        for level in (3, 2, 1):
            out = Up(
                skip_features=2 * widths[level],
                features=2 * widths[level],
                learned_bilinear=self.learned_bilinear,
                name=f"up_block{4 - level}",
                **common,
            )(fused[level], out, train)

        # ---- up_block4 (C=2w @ full res): packed ----
        # remat the WHOLE up-block as one unit (upsample-conv included),
        # matching the plain model's UpBlock remat boundary — the full-res
        # upsample activations are the network's peak-memory stage
        PUp = maybe_remat(_PackedUpBlock4, self.remat, 3)
        outp = PUp(
            features=2 * w, h=H, w=W, learned_bilinear=self.learned_bilinear,
            remat=False, name="up_block4",
            **dict(pcommon, block_barrier=_up4_barrier(
                self.block_barrier, self.barrier_scope)),
        )(f1p, out, train)

        # ---- 1x1 head on the packed tensor (block-diagonal over phases) ----
        kh, bh = _ConvParams(1, 1, 2 * w, self.num_classes, name="Conv_0")()
        logits_p = struct_conv(
            outp, kh, bh, (2, 2), (2, 2), (0, 0), (0, 0),
            (H // 2, W // 2), dtype, pad=0,
        )
        logits = unpack(logits_p.astype(jnp.float32), 2, 2)
        return logits


class _PackedDownBlock1(nn.Module):
    """UNet's first DownBlock (no pool) with the ConvBlock packed.
    Variable tree == plain DownBlock (child ConvBlock_0)."""

    features: int
    cin: int
    h: int
    w: int
    norm: str = "batch"
    groups: int = 8
    dtype: Dtype = jnp.bfloat16
    remat: bool = False
    block_barrier: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        Block = maybe_remat(PackedConvBlock, self.remat, 2)
        return Block(
            self.features, self.cin, self.h, self.w,
            norm=self.norm, groups=self.groups, dtype=self.dtype,
            block_barrier=self.block_barrier, name="ConvBlock_0",
        )(x, train)


class PackedUNet(nn.Module):
    """UNet (no spatial attention) with lane-dense packed full-resolution
    stages — the same transform as PackedFuseUNet for the single-modal
    family (kidney/breast presets: width 64 at 512/384 px, where the C=w
    stages fill half the lanes and carry 4x the pixels of the CHAOS
    point). Variable tree is IDENTICAL to models.unet.UNet."""

    num_classes: int = 2
    base_width: int = 64
    learned_bilinear: bool = False
    norm: str = "batch"
    group_norm_groups: int = 8
    axis_name: Optional[str] = None
    compute_dtype: str = "bfloat16"
    remat: bool = False
    block_barrier: bool = False
    barrier_scope: str = "encoder"  # encoder | all (see _up4_barrier)

    @nn.compact
    def __call__(self, x, train: bool = True):
        from aide_tpu.models.blocks import DownBlock

        dtype = blocks.resolve_dtype(self.compute_dtype)
        w = self.base_width
        widths = [w, 2 * w, 4 * w, 8 * w, 16 * w]
        common = dict(
            norm=self.norm,
            groups=self.group_norm_groups,
            axis_name=self.axis_name,
            dtype=dtype,
        )
        Down = maybe_remat(DownBlock, self.remat, 2)
        Up = maybe_remat(UpBlock, self.remat, 3)
        B, H, W, _ = x.shape
        if H % 16 or W % 16:
            raise ValueError("PackedUNet needs H, W divisible by 16")

        xp = pack(x.astype(dtype), 2, 2)
        x1p = _PackedDownBlock1(
            w, x.shape[-1], H, W, norm=self.norm,
            groups=self.group_norm_groups,
            dtype=dtype, remat=self.remat,
            block_barrier=self.block_barrier, name="down_block1",
        )(xp, train)

        skips = [x1p]
        # level 2 consumes the phase-pooled (= 2x2 max-pooled) level-1
        # output, already at half res, so its DownBlock skips the pool
        y = phase_pool(x1p, w)
        for level in (1, 2, 3, 4):
            y = Down(
                widths[level], pool=level > 1,
                name=f"down_block{level + 1}", **common,
            )(y, train)
            skips.append(y)

        out = skips[-1]
        for level in (3, 2, 1):
            out = Up(
                skip_features=widths[level],
                features=widths[level],
                learned_bilinear=self.learned_bilinear,
                name=f"up_block{4 - level}",
                **common,
            )(skips[level], out, train)

        PUp = maybe_remat(_PackedUpBlock4, self.remat, 3)
        outp = PUp(
            features=w, h=H, w=W, learned_bilinear=self.learned_bilinear,
            norm=self.norm, groups=self.group_norm_groups, dtype=dtype,
            remat=False,
            block_barrier=_up4_barrier(self.block_barrier, self.barrier_scope),
            name="up_block4",
        )(x1p, out, train)

        kh, bh = _ConvParams(1, 1, w, self.num_classes, name="Conv_0")()
        logits_p = struct_conv(
            outp, kh, bh, (2, 2), (2, 2), (0, 0), (0, 0),
            (H // 2, W // 2), dtype, pad=0,
        )
        return unpack(logits_p.astype(jnp.float32), 2, 2)
