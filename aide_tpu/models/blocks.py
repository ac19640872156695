"""Shared network blocks (conv, up/down, attention) in Flax linen, NHWC.

Re-designs the reference block zoo
(/root/reference/models_singlemodalinput/UNet.py:4-133 and
/root/reference/models_twomodalinputs/netblocks.py) for TPU: NHWC layout so
XLA tiles convolutions onto the MXU, bfloat16 compute with float32
parameters/statistics, and a pluggable norm (BatchNorm or GroupNorm for
tiny per-device batches). BatchNorm statistics are GLOBAL-batch under data
parallelism because the train steps run under jit/GSPMD: the batch-axis
reductions inside BatchNorm are computed over the full (sharded) batch by
XLA-inserted collectives, so no `axis_name` wiring is needed or used by the
model factories (pinned step- and epoch-level by tests/test_dp_equivalence).
The optional ``axis_name`` field on the blocks exists ONLY for callers that
execute the model inside `shard_map`/`pmap`, where per-replica locality
would otherwise break the reference's DataParallel BN semantics. The
reference's hardcoded ``.cuda()`` in its BAM block (UNet.py:54,
netblocks.py:115) has no analogue here.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def resolve_dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}[
        name
    ]


def maybe_remat(module_cls, enabled: bool, train_argnum: int):
    """Wrap a block in lifted rematerialization (checkpoint) when enabled.

    ``train_argnum`` is the position of the static ``train`` flag in the
    transformed call signature (self included)."""
    if not enabled:
        return module_cls
    return nn.remat(module_cls, static_argnums=(train_argnum,))


class Norm(nn.Module):
    """Norm factory: 'batch' or 'group'. Batch stats are global under
    jit/GSPMD (module docstring); `axis_name` is only for shard_map/pmap
    callers."""

    kind: str = "batch"
    groups: int = 8
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                axis_name=self.axis_name if train else None,
            )(x)
        if self.kind == "group":
            g = min(self.groups, x.shape[-1])
            while x.shape[-1] % g != 0:
                g -= 1
            return nn.GroupNorm(
                num_groups=g, dtype=self.dtype, param_dtype=jnp.float32
            )(x)
        raise ValueError(f"unknown norm kind {self.kind!r}")


class Conv1x1(nn.Module):
    """Pointwise conv emitted as a dot_general instead of a 1x1 lax.conv.

    Parameter-compatible with ``nn.Conv(features, (1, 1))`` — same
    ``kernel`` (1, 1, Cin, Cout) / ``bias`` (Cout,) shapes, names and
    initializers — so checkpoints are unaffected; callers pass an explicit
    ``name="Conv_K"`` to keep the auto-numbered paths.

    Why: XLA's SPMD partitioner miscompiles a *vmapped* 1x1 convolution
    whose lhs AND rhs are sharded over the vmap axis (the dual-net ``net``
    mesh axis here): the grouped-conv/dot rewrite loses the group-dim
    sharding and returns deterministically wrong values (max|diff| ~ O(1)
    on random inputs, jax 0.9.0, CPU and TPU SPMD share the partitioner).
    Spatial kernels (2x2/3x3) partition correctly; so does the dot form of
    the pointwise conv. Repro + probe: experiments/mesh_axes_probe.py.
    """

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        y = jnp.einsum(
            "...i,io->...o", x.astype(self.dtype), kernel[0, 0].astype(self.dtype)
        )
        return y + bias.astype(self.dtype)


class ConvBlock(nn.Module):
    """Two conv3x3 -> norm -> relu stages (basic_block, UNet.py:16-28)."""

    features: int
    norm: str = "batch"
    groups: int = 8
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        for _ in range(2):
            x = nn.Conv(
                self.features,
                (3, 3),
                padding=1,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
            x = Norm(self.norm, self.groups, self.axis_name, self.dtype)(x, train)
            x = nn.relu(x)
        return x


def max_pool_2x2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, 2H, 2W, C), bilinear with half-pixel centers.

    Kept as jax.image.resize: a hand-written interleave stencil
    (shift + stack + reshape) was measured SLOWER on TPU v5e (fwd 14.0 ->
    15.4 ms at bs8/256px) — the reshape interleave emits worse data
    formatting than the two dot_generals XLA uses for resize."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


class DownBlock(nn.Module):
    """Optional 2x2 maxpool then ConvBlock (UNet_basic_down_block,
    UNet.py:110-121)."""

    features: int
    pool: bool = True
    norm: str = "batch"
    groups: int = 8
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.pool:
            x = max_pool_2x2(x)
        return ConvBlock(
            self.features, self.norm, self.groups, self.axis_name, self.dtype
        )(x, train)


class UpsampleConv(nn.Module):
    """2x upsample then conv -> norm -> relu (UNet_up_conv_bn_relu,
    UNet.py:4-14): bilinear resize + conv3x3 by default, or a learned
    ConvTranspose(k2, s2) when ``learned_bilinear``.

    The resize uses half-pixel-center bilinear (jax.image.resize); the
    reference's align_corners=True variant differs by a sub-pixel shift —
    a documented behavioural deviation, irrelevant after training.
    """

    features: int
    learned_bilinear: bool = False
    norm: str = "batch"
    groups: int = 8
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, h, w, c = x.shape
        if self.learned_bilinear:
            x = nn.ConvTranspose(
                self.features,
                (2, 2),
                strides=(2, 2),
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        else:
            x = upsample2x_bilinear(x)
            x = nn.Conv(
                self.features,
                (3, 3),
                padding=1,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        x = Norm(self.norm, self.groups, self.axis_name, self.dtype)(x, train)
        return nn.relu(x)


class UpBlock(nn.Module):
    """Upsample, concat skip, ConvBlock (UNet_basic_up_block,
    UNet.py:123-133)."""

    skip_features: int     # channels produced by the upsample (== skip's)
    features: int          # output channels of the fused ConvBlock
    learned_bilinear: bool = False
    norm: str = "batch"
    groups: int = 8
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, skip, x, train: bool = True):
        x = UpsampleConv(
            self.skip_features,
            self.learned_bilinear,
            self.norm,
            self.groups,
            self.axis_name,
            self.dtype,
        )(x, train)
        x = jnp.concatenate([x, skip], axis=-1)
        return ConvBlock(
            self.features, self.norm, self.groups, self.axis_name, self.dtype
        )(x, train)


class CAUpBlock(nn.Module):
    """Up block with channel-attention gating of the fused features
    (UNet_ca_up_block, netblocks.py:149-161); ``residual`` adds the
    ungated features back (UNet_resca_up_block, :163-175)."""

    skip_features: int
    features: int
    residual: bool = False
    learned_bilinear: bool = False
    reduction: int = 16
    norm: str = "batch"
    groups: int = 8
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, skip, x, train: bool = True):
        x = UpsampleConv(
            self.skip_features,
            self.learned_bilinear,
            self.norm,
            self.groups,
            self.axis_name,
            self.dtype,
        )(x, train)
        x = jnp.concatenate([x, skip], axis=-1)
        gate = ChannelAttention(self.reduction, self.dtype)(x)
        x = gate * x + x if self.residual else gate * x
        return ConvBlock(
            self.features, self.norm, self.groups, self.axis_name, self.dtype
        )(x, train)


class ChannelAttention(nn.Module):
    """Squeeze-excite channel gate (Channel_Attention, UNet.py:67-82):
    returns (B, 1, 1, C) sigmoid weights."""

    reduction: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))  # (B, C)
        y = nn.Dense(max(1, c // self.reduction), dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.sigmoid(y)
        return y[:, None, None, :]


class SpatialAttention(nn.Module):
    """Dilated-conv spatial gate (Spatial_Attention, UNet.py:85-106):
    1x1 reduce -> two 3x3 dilated convs -> 1x1 -> norm -> sigmoid, returns
    (B, H, W, 1) weights."""

    reduction: int = 16
    dilation: int = 4
    norm: str = "batch"
    groups: int = 8
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = x.shape[-1]
        mid = max(1, c // self.reduction)
        y = Conv1x1(mid, dtype=self.dtype, name="Conv_0")(x)
        for i in range(2):
            y = nn.Conv(
                mid,
                (3, 3),
                kernel_dilation=(self.dilation, self.dilation),
                padding=self.dilation,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"Conv_{i + 1}",
            )(y)
        y = Conv1x1(1, dtype=self.dtype, name="Conv_3")(y)
        y = Norm(self.norm, 1, self.axis_name, self.dtype)(y, train)
        return nn.sigmoid(y)


class BottleneckAttention(nn.Module):
    """BAM-style combined gate (Bottleneck_Attention_Module, UNet.py:30-65):
    x + sigmoid(channel + spatial) * x."""

    reduction: int = 16
    dilation: int = 4
    norm: str = "batch"
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        ca = ChannelAttention(self.reduction, self.dtype)(x)          # (B,1,1,C)
        c = x.shape[-1]
        mid = max(1, c // self.reduction)
        y = Conv1x1(mid, dtype=self.dtype, name="Conv_0")(x)
        y = nn.Conv(
            mid, (3, 3), kernel_dilation=(self.dilation, self.dilation),
            padding=self.dilation, dtype=self.dtype, param_dtype=jnp.float32,
            name="Conv_1",
        )(y)
        y = nn.Conv(
            mid, (3, 3), kernel_dilation=(self.dilation, self.dilation),
            padding=self.dilation, dtype=self.dtype, param_dtype=jnp.float32,
            name="Conv_2",
        )(y)
        y = Conv1x1(1, dtype=self.dtype, name="Conv_3")(y)
        y = Norm(self.norm, 1, self.axis_name, self.dtype)(y, train)  # (B,H,W,1)
        gate = nn.sigmoid(ca + y)
        return x + gate * x


class FeatureRefine(nn.Module):
    """Residual conv refine block (Feature_refine_block,
    netblocks.py:52-66)."""

    features: int
    norm: str = "batch"
    groups: int = 8
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, param_dtype=jnp.float32)(x)
        y = Norm(self.norm, self.groups, self.axis_name, self.dtype)(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = Norm(self.norm, self.groups, self.axis_name, self.dtype)(y, train)
        return nn.relu(x + y)
