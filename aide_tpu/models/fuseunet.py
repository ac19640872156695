"""Two-modal FuseUNet family (in-phase / out-phase DICOM fusion).

Re-designs /root/reference/models_twomodalinputs/fuseunet.py: two 5-level
encoders fused by channel-concat at every scale (y1..y5 at fuseunet.py:49-81),
a single decoder consuming the fused skips (:85-89), and a 1x1 head.

Variants:
  * ``fuseunet`` — modal-1 encoder consumes the *fused* maps (its blocks see
    doubled input channels, fuseunet.py:12-20)
  * ``fuseunetsa`` — per-level spatial-attention gating on both encoders
    (:93-208)
  * ``fuseunetsaseparate`` — encoders stay separate; fusion only feeds the
    decoder skips (:210-325)
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from aide_tpu.core.registry import MODELS
from aide_tpu.models import blocks
from aide_tpu.models.blocks import (
    Conv1x1,
    ConvBlock,
    SpatialAttention,
    UpBlock,
    max_pool_2x2,
    maybe_remat,
)


class FuseUNet(nn.Module):
    num_classes: int = 2
    base_width: int = 32
    variant: str = "plain"        # plain | sa | sa_separate
    learned_bilinear: bool = False
    attention_reduction: int = 16
    attention_dilation: int = 4
    norm: str = "batch"
    group_norm_groups: int = 8
    axis_name: Optional[str] = None
    compute_dtype: str = "bfloat16"
    remat: bool = False

    @nn.compact
    def __call__(self, modal1, modal2, train: bool = True):
        if self.variant not in ("plain", "sa", "sa_separate"):
            raise ValueError(f"unknown FuseUNet variant {self.variant!r}")
        dtype = blocks.resolve_dtype(self.compute_dtype)
        Block = maybe_remat(ConvBlock, self.remat, 2)
        Up = maybe_remat(UpBlock, self.remat, 3)
        w = self.base_width
        widths = [w, 2 * w, 4 * w, 8 * w, 16 * w]
        common = dict(
            norm=self.norm,
            groups=self.group_norm_groups,
            axis_name=self.axis_name,
            dtype=dtype,
        )
        use_sa = self.variant in ("sa", "sa_separate")
        # 'plain'/'sa': modal-1 descends through the fused maps; 'sa_separate'
        # keeps the encoders independent.
        fused_descent = self.variant != "sa_separate"

        def gate(x, name):
            if not use_sa:
                return x
            g = SpatialAttention(
                self.attention_reduction,
                self.attention_dilation,
                self.norm,
                self.group_norm_groups,
                self.axis_name,
                dtype,
                name=name,
            )(x, train)
            return g * x

        y = modal1.astype(dtype)
        x = modal2.astype(dtype)
        fused = []
        for level, feats in enumerate(widths):
            if level > 0:
                y = max_pool_2x2(fused[-1] if fused_descent else y)
                x = max_pool_2x2(x)
            y = Block(feats, name=f"modal1_block{level + 1}", **common)(y, train)
            y = gate(y, f"modal1_sa{level + 1}")
            x = Block(feats, name=f"modal2_block{level + 1}", **common)(x, train)
            x = gate(x, f"modal2_sa{level + 1}")
            fused.append(jnp.concatenate([y, x], axis=-1))  # 2*feats channels

        out = fused[-1]
        for level in range(3, -1, -1):
            out = Up(
                skip_features=2 * widths[level],
                features=2 * widths[level],
                learned_bilinear=self.learned_bilinear,
                name=f"up_block{4 - level}",
                **common,
            )(fused[level], out, train)

        logits = Conv1x1(self.num_classes, dtype=dtype, name="Conv_0")(out)
        return logits.astype(jnp.float32)


def _register():
    variants = {
        "fuseunet": "plain",
        "fuseunetsa": "sa",
        "fuseunetsaseparate": "sa_separate",
    }
    for name, variant in variants.items():

        @MODELS.register(name)
        def factory(cfg, _variant=variant):
            if getattr(cfg, "packed", False) and _variant == "plain":
                # lane-dense packed execution — same variable tree, same
                # math, faster narrow stages (models/packed.py)
                from aide_tpu.models.packed import PackedFuseUNet

                return PackedFuseUNet(
                    num_classes=cfg.num_classes,
                    base_width=cfg.base_width or 32,
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
            return FuseUNet(
                num_classes=cfg.num_classes,
                base_width=cfg.base_width or 32,
                variant=_variant,
                learned_bilinear=cfg.learned_bilinear,
                attention_reduction=cfg.attention_reduction,
                attention_dilation=cfg.attention_dilation,
                norm=cfg.norm,
                group_norm_groups=cfg.group_norm_groups,
                compute_dtype=cfg.compute_dtype,
                remat=cfg.remat,
            )


_register()
