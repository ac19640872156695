"""Segmentation metrics (2D per-batch and 3D per-case).

Re-implements /root/reference/utils/metrics2d.py plus the 3D metrics the
reference duplicates inline in its trainers (Dice3d_fn at
trainchaos_proposed_30cases1labeled.py:123-130, IoU3d/TP_TN_FP_FN3d at
evalchaos_comparison_1cases.py:125-141; the shipped utils/metrics3d.py is an
empty stub).

Conventions preserved:
  * ``dice_fn`` returns the SUM of per-image dice over the batch (callers
    divide by their own sample count), with the empty-mask rule: both pred
    and target empty => 1.0, pred nonempty on empty target => 0.0
    (metrics2d.py:19-24).
  * unlike the reference, inputs are never mutated in place
    (metrics2d.py:11-12 thresholds into its own input tensor), and
    ``tp_tn_fp_fn`` accumulates over the batch instead of overwriting per
    image (reference bug at metrics2d.py:54-70 — fixed, documented).

All functions are pure jnp and usable inside jit; they accept NumPy arrays
too. Layout: logits (B, H, W, C), targets (B, H, W).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _binarize_fg(logits: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Foreground mask from logits. Binary heads follow the reference
    (softmax fg prob >= threshold, metrics2d.py:11-12); for C > 2 heads
    foreground is argmax > 0 (any non-background class) — the reference
    only ships binary heads, so this is our convention, documented."""
    if logits.shape[-1] > 2:
        return (jnp.argmax(logits, axis=-1) > 0).astype(jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., 1]
    return (probs >= threshold).astype(jnp.float32)


def _binarize_target(targets: jnp.ndarray) -> jnp.ndarray:
    """Label map -> foreground mask (identity on binary {0,1} labels)."""
    return (targets > 0).astype(jnp.float32)


def _dice_vector(logits: jnp.ndarray, targets: jnp.ndarray, threshold: float):
    """Per-image thresholded Dice plus the not-trivially-empty flag shared
    by dice_fn / dice_fn_nozero (one definition of the empty-mask rules)."""
    pred = _binarize_fg(logits, threshold)
    n = pred.shape[0]
    iflat = pred.reshape(n, -1)
    tflat = _binarize_target(targets).reshape(n, -1)
    inter = jnp.sum(iflat * tflat, axis=1)
    isum = jnp.sum(iflat, axis=1)
    tsum = jnp.sum(tflat, axis=1)
    dice = jnp.where(
        tsum == 0,
        jnp.where(isum == 0, 1.0, 0.0),
        2.0 * inter / jnp.maximum(isum + tsum, 1e-12),
    )
    counted = jnp.where((tsum == 0) & (isum == 0), 0, 1)
    return dice, counted


def dice_fn(logits: jnp.ndarray, targets: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Batch-summed thresholded Dice (Dice_fn, metrics2d.py:8-29)."""
    dice, _ = _dice_vector(logits, targets, threshold)
    return jnp.sum(dice)


def dice_fn_nozero(logits: jnp.ndarray, targets: jnp.ndarray, threshold: float = 0.5):
    """Dice sum + count of images that are not trivially-empty matches
    (Dice_fn_Nozero, metrics2d.py:31-52)."""
    dice, counted = _dice_vector(logits, targets, threshold)
    return jnp.sum(dice), jnp.sum(counted)


def iou_fn(logits: jnp.ndarray, targets: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Batch-summed thresholded IoU (IoU_fn, metrics2d.py:72-84).

    Deviation, documented: the reference's 0/0 on a both-empty image is NaN
    (poisoning the batch sum); here a both-empty image scores 1.0 — the same
    perfect-match convention dice_fn uses."""
    pred = _binarize_fg(logits, threshold)
    n = pred.shape[0]
    iflat = pred.reshape(n, -1)
    tflat = _binarize_target(targets).reshape(n, -1)
    inter = jnp.sum(iflat * tflat, axis=1)
    union = jnp.sum(iflat, axis=1) + jnp.sum(tflat, axis=1) - inter
    iou = jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1e-12))
    return jnp.sum(iou)


def tp_tn_fp_fn(logits: jnp.ndarray, targets: jnp.ndarray, threshold: float = 0.5):
    """Confusion-matrix counts accumulated over the batch (fixes the
    overwrite bug at metrics2d.py:54-70)."""
    pred = _binarize_fg(logits, threshold)
    t = _binarize_target(targets)
    tp = jnp.sum(pred * t)
    tn = jnp.sum((1 - pred) * (1 - t))
    fp = jnp.sum(pred * (1 - t))
    fn = jnp.sum((1 - pred) * t)
    return tp, tn, fp, fn


# ------------------------- multiclass (argmax) -------------------------


def _onehot_argmax(logits: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    pred = jnp.argmax(logits, axis=-1)
    return jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)


def multiclass_dice_fn(logits: jnp.ndarray, targets_onehot: jnp.ndarray) -> jnp.ndarray:
    """Per-class Dice averaged over the batch with union-0 => 1.0
    (MulticlassDice_fn, metrics2d.py:111-138). Returns (C,)."""
    c = targets_onehot.shape[-1]
    pred = _onehot_argmax(logits, c)
    n = pred.shape[0]
    iflat = pred.reshape(n, -1, c)
    tflat = targets_onehot.reshape(n, -1, c).astype(jnp.float32)
    inter = 2.0 * jnp.sum(iflat * tflat, axis=1)
    union = jnp.sum(iflat, axis=1) + jnp.sum(tflat, axis=1)
    dice = jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1e-12))
    return jnp.sum(dice, axis=0) / n


def multiclass_iou_fn(logits: jnp.ndarray, targets_onehot: jnp.ndarray) -> jnp.ndarray:
    """Per-class IoU averaged over the batch (MulticlassIoU_fn,
    metrics2d.py:140-167)."""
    c = targets_onehot.shape[-1]
    pred = _onehot_argmax(logits, c)
    n = pred.shape[0]
    iflat = pred.reshape(n, -1, c)
    tflat = targets_onehot.reshape(n, -1, c).astype(jnp.float32)
    inter = jnp.sum(iflat * tflat, axis=1)
    union = jnp.sum(iflat, axis=1) + jnp.sum(tflat, axis=1)
    iou = jnp.where(union == 0, 1.0, inter / jnp.maximum(union - inter, 1e-12))
    return jnp.sum(iou, axis=0) / n


def multiclass_accuracy_fn(logits: jnp.ndarray, targets_onehot: jnp.ndarray) -> jnp.ndarray:
    """Correct-pixel count / N (MulticlassAccuracy_fn, metrics2d.py:86-109)."""
    c = targets_onehot.shape[-1]
    pred = _onehot_argmax(logits, c)
    n = targets_onehot.shape[0]
    correct = jnp.sum(pred * targets_onehot.astype(jnp.float32))
    return correct / n


def multiclass_tp_tn_fp_fn(logits: jnp.ndarray, targets_onehot: jnp.ndarray):
    """Per-class confusion counts / N (MulticlassTP_TN_FP_FN,
    metrics2d.py:169-196). Returns four (C,) arrays."""
    c = targets_onehot.shape[-1]
    pred = _onehot_argmax(logits, c)
    n = pred.shape[0]
    iflat = pred.reshape(n, -1, c)
    tflat = targets_onehot.reshape(n, -1, c).astype(jnp.float32)
    tp = jnp.sum(iflat * tflat, axis=(0, 1)) / n
    tn = jnp.sum((1 - iflat) * (1 - tflat), axis=(0, 1)) / n
    fp = jnp.sum(iflat * (1 - tflat), axis=(0, 1)) / n
    fn = jnp.sum((1 - iflat) * tflat, axis=(0, 1)) / n
    return tp, tn, fp, fn


# ------------------------------ 3D (per case) ------------------------------


def dice3d(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Volume Dice 2I/(|P|+|T|) (Dice3d_fn,
    trainchaos_proposed_30cases1labeled.py:123-130) with the union-0 guard
    from trainprostate_proposed_isbi3ttransferisbidx.py:113-126 (=> 1.0)."""
    p = (pred.reshape(-1) > 0).astype(jnp.float32)
    t = (target.reshape(-1) > 0).astype(jnp.float32)
    inter = 2.0 * jnp.sum(p * t)
    union = jnp.sum(p) + jnp.sum(t)
    return jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1e-12))


def iou3d(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Volume IoU (IoU3d_fn, evalchaos_comparison_1cases.py:125-133)."""
    p = (pred.reshape(-1) > 0).astype(jnp.float32)
    t = (target.reshape(-1) > 0).astype(jnp.float32)
    inter = jnp.sum(p * t)
    union = jnp.sum(p) + jnp.sum(t) - inter
    return jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1e-12))


def tp_tn_fp_fn_3d(pred: jnp.ndarray, target: jnp.ndarray):
    """Volume confusion counts (TP_TN_FP_FN3d,
    evalchaos_comparison_1cases.py:135-141)."""
    p = (pred.reshape(-1) > 0).astype(jnp.float32)
    t = (target.reshape(-1) > 0).astype(jnp.float32)
    tp = jnp.sum(p * t)
    tn = jnp.sum((1 - p) * (1 - t))
    fp = jnp.sum(p * (1 - t))
    fn = jnp.sum((1 - p) * t)
    return tp, tn, fp, fn
