"""Test-time-augmentation pseudo-label machinery, fully on device.

Covers the reference's TTA block (/root/reference/train_files/
trainchaos_proposed_30cases1labeled.py:263-292): generate V augmented views,
run both nets on them, invert the augmentation on the predicted logits,
average the softmaxes, temperature-sharpen, and derive the confidence
weightmap. Here view generation and inversion are batched affine warps
(ops/warp.py) and the V views are folded into the batch axis so the network
sees one (V*B) forward instead of V sequential ones.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from aide_tpu.ops import warp


def sample_view_params(
    key: jax.Array,
    num_views: int,
    batch: int,
    rotation_degree: float,
    hflip_prob: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-view, per-image rotation angles and flip flags.

    Mirrors RandomRotate (uniform in ±degree) and RandomHorizontallyFlip
    (independent coin per copy) from datasetchaos_proposed/transform.py:81-106
    and :16-34. The reference's first view often keeps degree1=0/hflip1=0
    only as the dict default — the transforms re-randomize all 4 copies, so
    all views here are random.
    """
    kd, kf = jax.random.split(key)
    degrees = jax.random.uniform(
        kd, (num_views, batch), minval=-rotation_degree, maxval=rotation_degree
    )
    hflip = (
        jax.random.uniform(kf, (num_views, batch)) < hflip_prob
    ).astype(jnp.float32)
    return degrees, hflip


def make_views(
    images: jnp.ndarray,
    degrees: jnp.ndarray,
    hflip: jnp.ndarray,
    fill: jnp.ndarray | float = 0.0,
    method: str = "auto",
) -> jnp.ndarray:
    """(B,H,W,C) -> (V,B,H,W,C) augmented views via one batched warp."""
    v, b = degrees.shape
    rep = jnp.broadcast_to(images[None], (v,) + images.shape)
    flat = rep.reshape((v * b,) + images.shape[1:])
    fill_flat = fill
    if jnp.ndim(fill) == 2:  # (B, C) -> (V*B, C); dtype-agnostic (np or jnp)
        fill_flat = jnp.tile(jnp.asarray(fill), (v, 1))
    out = warp.augment(
        flat, degrees.reshape(-1), hflip.reshape(-1), fill_flat, method=method
    )
    return out.reshape((v, b) + images.shape[1:])


def invert_views(
    view_logits: jnp.ndarray,
    degrees: jnp.ndarray,
    hflip: jnp.ndarray,
    method: str = "auto",
) -> jnp.ndarray:
    """Invert augmentation on per-view logits (V,B,H,W,C), zero fill —
    matching reverseaug operating on raw logits before softmax
    (trainchaos_proposed_30cases1labeled.py:268-272)."""
    v, b = degrees.shape
    flat = view_logits.reshape((v * b,) + view_logits.shape[2:])
    out = warp.invert(
        flat, degrees.reshape(-1), hflip.reshape(-1), 0.0, method=method
    )
    return out.reshape(view_logits.shape)


def sharpen(probs: jnp.ndarray, temperature: float, mode: str = "pow_t") -> jnp.ndarray:
    """Temperature sharpening of averaged softmax.

    The reference has two conventions (identical at the default T=1.0):
    ``pow_t`` = probs**T (chaos/prostate,
    trainchaos_proposed_30cases1labeled.py:97-101) and ``pow_inv_t`` =
    probs**(1/T) (kidney/breast, trainkidney_proposed_mask1.py:113-117).
    """
    if mode == "pow_t":
        p = jnp.power(probs, temperature)
    elif mode == "pow_inv_t":
        p = jnp.power(probs, 1.0 / temperature)
    else:
        raise ValueError(f"unknown sharpen mode {mode!r}")
    return p / jnp.sum(p, axis=-1, keepdims=True)


def confidence_weightmap(pseudo_probs: jnp.ndarray) -> jnp.ndarray:
    """Confidence weight in [0, 1], low near the decision boundary.

    Binary (C=2): the reference's w = 1 - 4*p0*p1
    (trainchaos_proposed_30cases1labeled.py:289-292). Multi-class
    generalization: 1 - normalized entropy (identical intent; the reference
    only trains binary heads). Returns (..., 1)."""
    c = pseudo_probs.shape[-1]
    if c == 2:
        w = 1.0 - 4.0 * pseudo_probs[..., 0] * pseudo_probs[..., 1]
    else:
        p = jnp.clip(pseudo_probs, 1e-8, 1.0)
        entropy = -jnp.sum(p * jnp.log(p), axis=-1)
        w = 1.0 - entropy / jnp.log(float(c))
    return w[..., None]


def ensemble_pseudo_labels(
    view_logits: jnp.ndarray,
    degrees: jnp.ndarray,
    hflip: jnp.ndarray,
    temperature: float,
    sharpen_mode: str = "pow_t",
    method: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full TTA ensemble: invert views, average softmax, sharpen, weightmap.

    Args:
      view_logits: (V, B, H, W, C) stop-gradient network outputs per view.
    Returns:
      pseudo (B, H, W, C) sharpened probabilities and weightmap (B, H, W, 1).
    """
    inv = invert_views(view_logits, degrees, hflip, method=method)
    probs = jax.nn.softmax(inv.astype(jnp.float32), axis=-1)
    avg = jnp.mean(probs, axis=0)
    pseudo = sharpen(avg, temperature, sharpen_mode)
    return pseudo, confidence_weightmap(pseudo)
