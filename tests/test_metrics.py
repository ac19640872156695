"""Metric convention tests (vs hand-computed values)."""

import numpy as np
import jax.numpy as jnp

from aide_tpu.ops import metrics


def _logits_from_pred(pred):
    """Binary prediction map -> confident logits (B,H,W,2)."""
    pred = np.asarray(pred, dtype=np.float32)
    return np.stack([(1 - pred) * 10.0, pred * 10.0 - 5.0 * (1 - pred)], axis=-1)


class TestDiceFn:
    def test_perfect_match(self):
        pred = np.zeros((2, 4, 4))
        pred[0, :2, :2] = 1
        logits = _logits_from_pred(pred)
        d = metrics.dice_fn(jnp.asarray(logits), jnp.asarray(pred))
        assert np.allclose(float(d), 2.0)  # sum over batch, each 1.0

    def test_both_empty_counts_one(self):
        """Empty pred on empty target => dice 1.0 (metrics2d.py:19-22)."""
        pred = np.zeros((1, 4, 4))
        logits = _logits_from_pred(pred)
        d = metrics.dice_fn(jnp.asarray(logits), jnp.asarray(pred))
        assert np.allclose(float(d), 1.0)

    def test_pred_on_empty_target_zero(self):
        pred = np.zeros((1, 4, 4))
        pred[0, 0, 0] = 1
        target = np.zeros((1, 4, 4))
        logits = _logits_from_pred(pred)
        d = metrics.dice_fn(jnp.asarray(logits), jnp.asarray(target))
        assert np.allclose(float(d), 0.0)

    def test_half_overlap(self):
        pred = np.zeros((1, 4, 4))
        pred[0, 0, :2] = 1  # 2 px
        target = np.zeros((1, 4, 4))
        target[0, 0, :4] = 1  # 4 px, overlap 2
        logits = _logits_from_pred(pred)
        d = metrics.dice_fn(jnp.asarray(logits), jnp.asarray(target))
        assert np.allclose(float(d), 2 * 2 / (2 + 4))

    def test_does_not_mutate_input(self):
        """Reference thresholds in place (metrics2d.py:11-12); we must not."""
        pred = np.zeros((1, 4, 4))
        logits = _logits_from_pred(pred)
        before = logits.copy()
        jl = jnp.asarray(logits)
        metrics.dice_fn(jl, jnp.asarray(pred))
        assert np.array_equal(np.asarray(jl), before)


class TestNozeroAndIoU:
    def test_nozero_counts(self):
        pred = np.zeros((3, 4, 4))
        pred[0, :2, :2] = 1
        logits = _logits_from_pred(pred)
        target = pred.copy()
        d, count = metrics.dice_fn_nozero(jnp.asarray(logits), jnp.asarray(target))
        assert np.allclose(float(d), 3.0)
        assert int(count) == 1  # only image 0 is non-trivial

    def test_iou(self):
        pred = np.zeros((1, 4, 4))
        pred[0, 0, :2] = 1
        target = np.zeros((1, 4, 4))
        target[0, 0, 1:3] = 1
        logits = _logits_from_pred(pred)
        iou = metrics.iou_fn(jnp.asarray(logits), jnp.asarray(target))
        assert np.allclose(float(iou), 1 / 3, atol=1e-6)

    def test_tp_tn_fp_fn_accumulates_batch(self):
        """Reference overwrites per image (metrics2d.py:54-70 bug); ours
        accumulates."""
        pred = np.zeros((2, 2, 2))
        pred[:, 0, 0] = 1
        target = np.zeros((2, 2, 2))
        target[:, 0, :] = 1
        logits = _logits_from_pred(pred)
        tp, tn, fp, fn = metrics.tp_tn_fp_fn(jnp.asarray(logits), jnp.asarray(target))
        assert (float(tp), float(tn), float(fp), float(fn)) == (2.0, 4.0, 0.0, 2.0)


class TestMulticlass:
    def test_multiclass_dice_union0_is_one(self):
        logits = np.full((1, 2, 2, 3), -5.0, dtype=np.float32)
        logits[..., 0] = 5.0  # predict class 0 everywhere
        onehot = np.zeros((1, 2, 2, 3), dtype=np.float32)
        onehot[..., 0] = 1.0
        d = metrics.multiclass_dice_fn(jnp.asarray(logits), jnp.asarray(onehot))
        assert np.allclose(np.asarray(d), [1.0, 1.0, 1.0])


class TestThreeD:
    def test_dice3d(self):
        a = np.zeros((4, 4, 3))
        b = np.zeros((4, 4, 3))
        a[0, 0, :] = 1
        b[0, 0, :2] = 1
        d = metrics.dice3d(jnp.asarray(a), jnp.asarray(b))
        assert np.allclose(float(d), 2 * 2 / (3 + 2))

    def test_dice3d_union0(self):
        z = np.zeros((2, 2, 2))
        assert float(metrics.dice3d(jnp.asarray(z), jnp.asarray(z))) == 1.0

    def test_iou3d_and_counts(self):
        a = np.zeros((2, 2, 1))
        b = np.zeros((2, 2, 1))
        a[0, 0, 0] = 1
        b[0, :, 0] = 1
        assert np.allclose(float(metrics.iou3d(jnp.asarray(a), jnp.asarray(b))), 0.5)
        tp, tn, fp, fn = metrics.tp_tn_fp_fn_3d(jnp.asarray(a), jnp.asarray(b))
        assert (float(tp), float(tn), float(fp), float(fn)) == (1.0, 2.0, 0.0, 1.0)


def test_iou_both_empty_scores_one():
    """Both-empty image: IoU 1.0 (perfect match), consistent with dice_fn —
    the reference's 0/0 NaN is a documented deviation (ops/metrics.py)."""
    logits = np.zeros((2, 4, 4, 2), np.float32)
    logits[..., 0] = 8.0  # confident background everywhere
    target = np.zeros((2, 4, 4), np.int32)
    target[1, 1, 1] = 1  # second image non-empty, predicted empty -> 0
    total = float(metrics.iou_fn(jnp.asarray(logits), jnp.asarray(target)))
    assert np.allclose(total, 1.0, atol=1e-6)
