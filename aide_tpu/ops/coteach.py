"""Co-teaching loss library (small-loss sample exchange variants).

Re-implements /root/reference/utils/coteach_loss.py:94-254 and
/root/reference/utils/reg_loss.py:130-193 with static shapes for XLA:
selection counts are Python ints (``num_remember``) or handled with masked
sorts, so every variant jit-compiles without dynamic shapes.

These are library losses — the shipped reference trainers never import them
(they are exported in utils/__init__.py:8-9 but unused; the flagship trainer
builds its exchange inline, which here lives in engine/steps.py
``make_coteach_train_step``). They are provided for capability parity.

All logits are NHWC (B, H, W, C); targets are (B, H, W) integer/binary maps.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from aide_tpu.ops import losses


def _per_image_ce_dice(logits, targets, weight: float) -> jnp.ndarray:
    """weight * mean-pixel CE + per-image Dice — the ranking loss used by
    every image-level variant (coteach_loss.py:102-103)."""
    ce = jnp.mean(
        losses.cross_entropy_2d(logits, targets, reduction="none"), axis=(1, 2)
    )
    dc = losses.dice_loss(logits, targets, reduction="none")
    return weight * ce + dc


def _num_remember(forget_rate: float, n: int) -> int:
    k = int((1.0 - forget_rate) * n)
    if k < 1:
        raise ValueError(
            f"forget_rate={forget_rate} keeps {k} of {n} samples; "
            "at least one sample/patch/pixel must be remembered"
        )
    return k


def coteach_drop_image(
    logits1: jnp.ndarray,
    logits2: jnp.ndarray,
    targets: jnp.ndarray,
    forget_rate: float,
    weight: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Image-level small-loss exchange (Coteachingloss_dropimage,
    coteach_loss.py:94-119): each net trains on the images the *other* net
    ranks lowest-loss."""
    n = logits1.shape[0]
    k = _num_remember(forget_rate, n)
    l1 = _per_image_ce_dice(logits1, targets, weight)
    l2 = _per_image_ce_dice(logits2, targets, weight)
    idx1 = jnp.argsort(l1)[:k]
    idx2 = jnp.argsort(l2)[:k]
    # the per-image loss vector is already computed for the ranking and
    # depends only on its own image, so the kept-set loss (and its gradient)
    # is a gather of it — no second CE+Dice pass over gathered feature maps
    loss1 = jnp.mean(l1[idx2])
    loss2 = jnp.mean(l2[idx1])
    return loss1, loss2


def coteach_weight_image(
    logits1: jnp.ndarray,
    logits2: jnp.ndarray,
    targets: jnp.ndarray,
    forget_rate: float,
    weight: float = 1.0,
    drop_weight: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Soft variant: dropped images keep a small weight
    (Coteachingloss_weightimage, coteach_loss.py:121-161)."""
    n = logits1.shape[0]
    k = _num_remember(forget_rate, n)
    l1 = _per_image_ce_dice(logits1, targets, weight)
    l2 = _per_image_ce_dice(logits2, targets, weight)
    order1 = jnp.argsort(l1)
    order2 = jnp.argsort(l2)

    def side(lvec, order):
        # reuse the ranking vector (per-image loss; see coteach_drop_image)
        keep, drop = order[:k], order[k:]
        loss = jnp.mean(lvec[keep])
        if n - k > 0:
            loss = loss + drop_weight * jnp.mean(lvec[drop])
        return loss

    return side(l1, order2), side(l2, order1)


def coteach_drop_region_ce(
    logits1: jnp.ndarray,
    logits2: jnp.ndarray,
    targets: jnp.ndarray,
    forget_rate: float,
    scale: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Region-level exchange via max-pooled patches
    (Coteachingloss_dropregionce, coteach_loss.py:163-196): max-pool logits
    and targets into a patch grid, rank patch CE per image, each net trains
    on the other's lowest-CE patches."""
    b, h, w, c = logits1.shape
    ph, pw = int(h * scale), int(w * scale)
    kh, kw = h // ph, w // pw
    # the reference pools with ceil_mode=True (coteach_loss.py:174), so a
    # trailing partial window contributes a patch; -inf padding on the high
    # edge reproduces that exactly (padded slots are the max identity)
    pad_h, pad_w = (-h) % kh, (-w) % kw

    def pool(x, is_label=False):
        if is_label:
            x = x.astype(jnp.float32)[..., None]
        r = jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            (1, kh, kw, 1),
            (1, kh, kw, 1),
            ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
        )
        return r[..., 0].astype(jnp.int32) if is_label else r

    p1 = pool(logits1)
    p2 = pool(logits2)
    pt = pool(targets, is_label=True)

    ce1 = losses.cross_entropy_2d(p1, pt, reduction="none").reshape(b, -1)
    ce2 = losses.cross_entropy_2d(p2, pt, reduction="none").reshape(b, -1)
    npatch = ce1.shape[1]
    k = _num_remember(forget_rate, npatch)
    idx1 = jnp.argsort(ce1, axis=1)[:, :k]
    idx2 = jnp.argsort(ce2, axis=1)[:, :k]
    loss1 = jnp.mean(jnp.take_along_axis(ce1, idx2, axis=1))
    loss2 = jnp.mean(jnp.take_along_axis(ce2, idx1, axis=1))
    return loss1, loss2


def _masked_smallest_mean(values: jnp.ndarray, mask: jnp.ndarray, remember_rate: float) -> jnp.ndarray:
    """Mean of the lowest remember_rate fraction of ``values`` where ``mask``
    — static-shape replacement for the reference's boolean indexing + argsort
    (coteach_loss.py:231-236)."""
    big = jnp.finfo(jnp.float32).max
    v = jnp.where(mask > 0, values, big)
    v_sorted = jnp.sort(v)
    n_fore = jnp.sum(mask > 0)
    k = jnp.floor(remember_rate * n_fore).astype(jnp.int32)
    ranks = jnp.arange(v.shape[0])
    sel = (ranks < k).astype(jnp.float32)
    return jnp.sum(v_sorted * sel) / jnp.maximum(k.astype(jnp.float32), 1.0)


def coteach_drop_image_drop_pixel(
    logits1: jnp.ndarray,
    logits2: jnp.ndarray,
    targets: jnp.ndarray,
    forget_rate: float,
    weight: float = 1.0,
    pixel_weight: float = 0.25,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Image-level exchange plus pixel-level selection on the dropped images
    (Coteachingloss_dropimagedroppixel, coteach_loss.py:198-254): on dropped
    images, rank foreground pixels by bidirectional-KL + CE and keep the
    lowest fraction. The reference's ``num_remember2`` use-before-definition
    (defined at :234, reused at :249) is fixed: each side computes its own
    count.
    """
    n = logits1.shape[0]
    k = _num_remember(forget_rate, n)
    l1 = _per_image_ce_dice(logits1, targets, weight)
    l2 = _per_image_ce_dice(logits2, targets, weight)
    order1 = jnp.argsort(l1)
    order2 = jnp.argsort(l2)
    keep1, drop1 = order1[:k], order1[k:]
    keep2, drop2 = order2[:k], order2[k:]

    # reuse the ranking vectors (see coteach_drop_image)
    loss1 = jnp.mean(l1[keep2])
    loss2 = jnp.mean(l2[keep1])

    remember_rate = 1.0 - forget_rate

    def pixel_side(sel_idx, primary, secondary):
        if n - k == 0:
            return jnp.asarray(0.0)
        a = primary[sel_idx]
        bb = secondary[sel_idx]
        t = targets[sel_idx]
        kl = losses.kl_bidirectional(a, bb)
        ce = losses.cross_entropy_2d(a, t, reduction="none")
        flat = ((kl + ce) * t.astype(jnp.float32)).reshape(-1)
        fg = t.astype(jnp.float32).reshape(-1) * (flat > 0).astype(jnp.float32)
        return _masked_smallest_mean(flat, fg, remember_rate)

    loss1 = loss1 + pixel_weight * pixel_side(drop2, logits1, logits2)
    loss2 = loss2 + pixel_weight * pixel_side(drop1, logits2, logits1)
    return loss1, loss2


def pixel_coreg_focal(
    logits1: jnp.ndarray,
    logits2: jnp.ndarray,
    logits3: jnp.ndarray,
    targets: jnp.ndarray,
    forget_rate: float,
    kd_weight: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Three-model pixel co-regularization (Pixelcoreg_Focalloss,
    reg_loss.py:58-128): nets 1/2 co-regularize via symmetric KL; the joint
    focal+KL map selects the lowest (1-forget_rate) pixels per image, and
    the KEPT loss is net 3's focal loss at those pixels. Returns
    (mean kept loss, foreground-retention ratio)."""
    b = targets.shape[0]
    t = targets.astype(jnp.float32)

    def focal(logits):
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return (
            -t * (1 - probs[..., 1]) ** 2 * logp[..., 1]
            - (1 - t) * (1 - probs[..., 0]) ** 2 * logp[..., 0]
        )

    l1 = focal(logits1).reshape(b, -1)
    l2 = focal(logits2).reshape(b, -1)
    l3 = focal(logits3).reshape(b, -1)
    kl = losses.kl_bidirectional(logits1, logits2).reshape(b, -1)
    joint = (1.0 - kd_weight) * (l1 + l2 + l3) + kd_weight * kl

    npix = joint.shape[1]
    k = _num_remember(forget_rate, npix)
    order = jnp.argsort(joint, axis=1)[:, :k]
    kept = jnp.take_along_axis(l3, order, axis=1)
    kept_t = jnp.take_along_axis(t.reshape(b, -1), order, axis=1)
    retention = jnp.sum(kept_t) / jnp.maximum(jnp.sum(t), 1.0)
    return jnp.mean(kept), retention


def pixel_coreg_focal_two_model(
    logits1: jnp.ndarray,
    logits2: jnp.ndarray,
    targets: jnp.ndarray,
    forget_rate: float,
    kd_weight: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel co-regularization: joint focal + symmetric-KL ranking keeps the
    lowest (1 - forget_rate) pixels per image
    (Pixelcoreg_Focalloss_twomodel, reg_loss.py:130-193). Returns
    (mean kept loss, foreground-retention ratio)."""
    b = targets.shape[0]
    t = targets.astype(jnp.float32)

    def focal(logits):
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return (
            -t * (1 - probs[..., 1]) ** 2 * logp[..., 1]
            - (1 - t) * (1 - probs[..., 0]) ** 2 * logp[..., 0]
        )

    l1 = focal(logits1).reshape(b, -1)
    l2 = focal(logits2).reshape(b, -1)
    kl = losses.kl_bidirectional(logits1, logits2).reshape(b, -1)
    joint = (1.0 - kd_weight) * (l1 + l2) + kd_weight * kl

    npix = joint.shape[1]
    k = _num_remember(forget_rate, npix)
    order = jnp.argsort(joint, axis=1)[:, :k]
    kept = jnp.take_along_axis(joint, order, axis=1)
    kept_t = jnp.take_along_axis(t.reshape(b, -1), order, axis=1)
    retention = jnp.sum(kept_t) / jnp.maximum(jnp.sum(t), 1.0)
    return jnp.mean(kept), retention
