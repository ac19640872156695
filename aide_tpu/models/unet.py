"""Width-parameterized single-modal UNet (+ spatial-attention variant).

One class replaces the reference's seven width clones (UNet / UNet128 /
UNet32 / UNet16 / UNet8 / UNet4 / UNet2,
/root/reference/models_singlemodalinput/UNet.py:135-401) and the attention
variant UNetsa (:168-208): 5-level encoder (w, 2w, 4w, 8w, 16w), bilinear
upsample+conv decoder with skip concats, 1x1 classification head.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from aide_tpu.core.registry import MODELS
from aide_tpu.models import blocks
from aide_tpu.models.blocks import (
    Conv1x1,
    DownBlock,
    SpatialAttention,
    UpBlock,
    maybe_remat,
)


class UNet(nn.Module):
    num_classes: int = 2
    base_width: int = 64
    learned_bilinear: bool = False
    spatial_attention: bool = False
    attention_reduction: int = 16
    attention_dilation: int = 4
    norm: str = "batch"
    group_norm_groups: int = 8
    axis_name: Optional[str] = None
    compute_dtype: str = "bfloat16"
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        dtype = blocks.resolve_dtype(self.compute_dtype)
        Down = maybe_remat(DownBlock, self.remat, 2)
        Up = maybe_remat(UpBlock, self.remat, 3)
        w = self.base_width
        widths = [w, 2 * w, 4 * w, 8 * w, 16 * w]
        common = dict(
            norm=self.norm,
            groups=self.group_norm_groups,
            axis_name=self.axis_name,
            dtype=dtype,
        )
        x = x.astype(dtype)

        skips = []
        for level, feats in enumerate(widths):
            # explicit names keep checkpoints identical with/without remat
            x = Down(feats, pool=level > 0, name=f"down_block{level + 1}", **common)(
                x, train
            )
            if self.spatial_attention:
                gate = SpatialAttention(
                    self.attention_reduction,
                    self.attention_dilation,
                    self.norm,
                    self.group_norm_groups,
                    self.axis_name,
                    dtype,
                )(x, train)
                x = gate * x
            skips.append(x)

        for level in range(3, -1, -1):
            x = Up(
                skip_features=widths[level],
                features=widths[level],
                learned_bilinear=self.learned_bilinear,
                name=f"up_block{4 - level}",
                **common,
            )(skips[level], x, train)

        logits = Conv1x1(self.num_classes, dtype=dtype, name="Conv_0")(x)
        return logits.astype(jnp.float32)


def _register_width_variants():
    def make(name, width, sa=False):
        @MODELS.register(name)
        def factory(cfg):
            if getattr(cfg, "packed", False) and not sa:
                # lane-dense packed execution — same variable tree, same
                # math, faster full-resolution stages (models/packed.py)
                from aide_tpu.models.packed import PackedUNet

                return PackedUNet(
                    num_classes=cfg.num_classes,
                    base_width=cfg.base_width or width,
                    learned_bilinear=cfg.learned_bilinear,
                    norm=cfg.norm,
                    group_norm_groups=cfg.group_norm_groups,
                    compute_dtype=cfg.compute_dtype,
                    remat=cfg.remat,
                    block_barrier=getattr(cfg, "packed_block_barrier", False),
                    barrier_scope=getattr(
                        cfg, "packed_block_barrier_scope", "encoder"
                    ),
                )
            return UNet(
                num_classes=cfg.num_classes,
                base_width=cfg.base_width or width,
                learned_bilinear=cfg.learned_bilinear,
                spatial_attention=sa,
                attention_reduction=cfg.attention_reduction,
                attention_dilation=cfg.attention_dilation,
                norm=cfg.norm,
                group_norm_groups=cfg.group_norm_groups,
                compute_dtype=cfg.compute_dtype,
                remat=cfg.remat,
            )

    make("unet", 64)
    make("unetsa", 64, sa=True)
    for width in (2, 4, 8, 16, 32, 128):
        make(f"unet{width}", width)


_register_width_variants()
