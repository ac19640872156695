"""Jitted train / eval / predict steps.

``make_coteach_train_step`` compiles the entire AIDE inner loop
(/root/reference/train_files/trainchaos_proposed_30cases1labeled.py:260-325)
into ONE XLA program per step:

  TTA view generation (on-device warps) -> both nets' view forwards (views
  folded into the batch axis, nets vmapped on a stacked params axis) ->
  inverse warps -> pseudo-label ensemble + sharpening + weightmap -> main
  forwards -> per-image loss ranking -> cross small-loss split -> seg +
  confidence-weighted consistency losses -> one backward over the stacked
  params -> optimizer update.

The reference runs 8 sequential view forwards with host PIL inversions in
between, then two backwards coupled by ``retain_graph=True``; here the
cross-coupling terms are ``stop_gradient`` ensembles, so one ``jax.grad``
over the stacked tree yields both nets' gradients exactly.

Selection semantics: the small-loss exchange ranks per-image losses within
the *global* batch (the reference's batch, :305-310, generalizing the
hardcoded ``[0:2]`` split to ``k = round(clean_fraction * B)``). Under data
parallelism the (B,)-sized rank/gather runs on replicated vectors — only
per-image scalars cross devices, never feature maps.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from aide_tpu.core.config import TrainConfig
from aide_tpu.ops import losses, metrics, tta, warp
from aide_tpu.engine.state import DualTrainState, TrainState


# ----------------------------- model plumbing -----------------------------


def _variables(params, batch_stats):
    v = {"params": params}
    if batch_stats:
        v["batch_stats"] = batch_stats
    return v


def make_forward(model, two_modal: bool):
    """forward(params, stats, batch_images, train, update_stats) ->
    (logits, new_stats). ``batch_images`` is a tuple of 1 or 2 arrays."""

    def forward(params, stats, images, train: bool, update_stats: bool):
        variables = _variables(params, stats)
        if train:
            # train-mode BN always writes running stats; declare the
            # collection mutable and keep or discard the update.
            out, upd = model.apply(
                variables, *images, train=True, mutable=["batch_stats"]
            )
            if update_stats:
                return out, upd.get("batch_stats", stats)
            return out, stats
        out = model.apply(variables, *images, train=False)
        return out, stats

    return forward


def batch_images(batch: Dict[str, Any], two_modal: bool) -> Tuple:
    """Batch images, normalized on device when shipped as uint8.

    The pipeline sends raw uint8 pixels plus per-image affine coefficients
    (normalized = u8 * scale + fill, data/pipeline.py) — 4x less
    host->device traffic than pre-normalized float32. Float inputs (tests,
    already-augmented batches) pass through unchanged; the dtype dispatch
    is trace-time static."""
    names = ("modal1", "modal2") if two_modal else ("image",)
    suffixes = ("1", "2") if two_modal else ("",)
    out = []
    for name, suf in zip(names, suffixes):
        img = batch[name]
        if img.dtype == jnp.uint8:
            img = (
                img.astype(jnp.float32) * batch[f"scale{suf}"][:, None, None, :]
                + batch[f"fill{suf}"][:, None, None, :]
            )
        out.append(img)
    return tuple(out)


def batch_fills(batch: Dict[str, Any], two_modal: bool) -> Tuple:
    if two_modal:
        return (batch["fill1"], batch["fill2"])
    return (batch["fill"],)


# ----------------------------- criterion zoo -----------------------------


def make_criterion(cfg: TrainConfig):
    """Scalar criterion for supervised training (--loss ce|dice|cedice,
    trainchaos_proposed_30cases1labeled.py:217-225)."""
    ct = cfg.coteach

    if cfg.optim.loss == "ce":
        return lambda logits, t: losses.cross_entropy_2d(
            logits, t, class_weight=ct.ceclass_weight
        )
    if cfg.optim.loss == "dice":
        return lambda logits, t: losses.multiclass_dice_loss(
            logits, t, class_weight=ct.diceclass_weight
        )
    if cfg.optim.loss == "cedice":
        return lambda logits, t: losses.cem_dice_loss(
            logits,
            t,
            cedice_weight=ct.cedice_weight,
            ceclass_weight=ct.ceclass_weight,
            diceclass_weight=ct.diceclass_weight,
        )
    raise ValueError(f"unknown loss {cfg.optim.loss!r}")


def make_image_criterion(cfg: TrainConfig):
    """Per-image loss vector (CEMDiceLossImage) used for ranking."""
    ct = cfg.coteach
    return lambda logits, t: losses.cem_dice_loss_image(
        logits,
        t,
        cedice_weight=ct.cedice_weight,
        ceclass_weight=ct.ceclass_weight,
        diceclass_weight=ct.diceclass_weight,
    )


# ----------------------------- main-view augmentation -----------------------------


def make_augment_batch(cfg: TrainConfig, two_modal: bool):
    """Random on-device warp of the MAIN training view (images + every
    target present in the batch), enabled by ``data.augment_main``.

    Off by default: the reference augments only the TTA copies — the main
    image gets resize+normalize only
    (trainchaos_proposed_30cases1labeled.py:191-197). Masks are warped as
    one-hot maps with zero fill and argmax'd back (out-of-extent pixels
    resolve to background), so images and labels move together."""
    num_classes = cfg.model.num_classes
    wm = cfg.data.warp_method

    @jax.jit
    def augment(batch, key):
        images = batch_images(batch, two_modal)
        fills = batch_fills(batch, two_modal)
        b = images[0].shape[0]
        degrees, hflip = tta.sample_view_params(
            key, 1, b, cfg.data.rotation_degree, cfg.data.hflip_prob
        )
        deg, fl = degrees[0], hflip[0]
        out = dict(batch)
        names = ("modal1", "modal2") if two_modal else ("image",)
        for name, img, fill in zip(names, images, fills):
            out[name] = warp.augment(img, deg, fl, fill, method=wm)
        for tname in ("target", "target1", "target2"):
            if tname in batch:
                t = batch[tname]
                onehot = jax.nn.one_hot(t, num_classes, dtype=jnp.float32)
                warped = warp.augment(onehot, deg, fl, 0.0, method=wm)
                out[tname] = jnp.argmax(warped, axis=-1).astype(t.dtype)
        return out

    return augment


# ----------------------------- supervised -----------------------------


def make_supervised_train_step(model, two_modal: bool, cfg: TrainConfig):
    """One optimizer step of the comparison (plain supervised) trainer
    (e.g. trainchaos_comparison_1case.py:190-202)."""
    forward = make_forward(model, two_modal)
    criterion = make_criterion(cfg)
    thr = cfg.eval.threshold

    # donate the state: params/opt buffers update in place on device
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch):
        images = batch_images(batch, two_modal)
        target = batch["target"]

        def loss_fn(params):
            logits, new_stats = forward(params, state.batch_stats, images, True, True)
            return criterion(logits, target), (logits, new_stats)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        out_metrics = {
            "loss": loss,
            "dice_sum": metrics.dice_fn(logits, target, threshold=thr),
            "count": jnp.asarray(target.shape[0], jnp.float32),
        }
        return new_state, out_metrics

    return step


# ----------------------------- co-teaching -----------------------------


def make_coteach_train_step(model, two_modal: bool, cfg: TrainConfig):
    forward = make_forward(model, two_modal)
    image_criterion = make_image_criterion(cfg)
    ct = cfg.coteach
    num_views = cfg.data.num_tta_views
    thr = cfg.eval.threshold
    wm = cfg.data.warp_method

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: DualTrainState, batch, key, rate):
        images = batch_images(batch, two_modal)
        fills = batch_fills(batch, two_modal)
        t1 = batch["target1"]
        t2 = batch["target2"]
        b = t1.shape[0]
        k_clean = max(1, min(b - 1, int(round(ct.clean_fraction * b))))

        # ---- TTA pseudo-labels (both nets, all views, one fused program) ----
        degrees, hflip = tta.sample_view_params(
            key, num_views, b, cfg.data.rotation_degree, cfg.data.hflip_prob
        )
        flat_views = tuple(
            tta.make_views(img, degrees, hflip, fill, method=wm).reshape(
                (num_views * b,) + img.shape[1:]
            )
            for img, fill in zip(images, fills)
        )

        def tta_fwd(params, stats):
            out, _ = forward(
                params, stats, flat_views,
                train=ct.tta_bn == "batch", update_stats=False,
            )
            return out

        view_logits = jax.vmap(tta_fwd)(state.params, state.batch_stats)
        view_logits = jax.lax.stop_gradient(view_logits)  # (2, V*B, H, W, C)

        # Invert both nets' views in ONE flat warp call (2*V views folded
        # into the view axis) rather than vmapping the warp kernel over the
        # net axis — Pallas kernels under vmap compile poorly.
        flat = view_logits.reshape((2 * num_views, b) + view_logits.shape[2:])
        deg2 = jnp.concatenate([degrees, degrees], axis=0)
        flip2 = jnp.concatenate([hflip, hflip], axis=0)
        inv = tta.invert_views(flat, deg2, flip2, method=wm)
        probs = jax.nn.softmax(inv.astype(jnp.float32), axis=-1)
        avg = jnp.mean(
            probs.reshape((2, num_views, b) + probs.shape[2:]), axis=1
        )
        pseudo = tta.sharpen(avg, ct.temperature, ct.sharpen_mode)
        wmap = tta.confidence_weightmap(pseudo)
        # pseudo: (2, B, H, W, C); wmap: (2, B, H, W, 1)

        # ---- coupled main forward/backward over the stacked net axis ----
        def loss_fn(params_stacked):
            def fwd(params, stats):
                return forward(params, stats, images, True, True)

            outputs, new_stats = jax.vmap(fwd)(params_stacked, state.batch_stats)
            out1, out2 = outputs[0], outputs[1]

            # per-image ranking loss: net k scored against the OTHER net's
            # working labels (:303-306)
            pre1 = image_criterion(out1, t2)
            pre2 = image_criterion(out2, t1)
            order1 = jnp.argsort(jax.lax.stop_gradient(pre1))
            order2 = jnp.argsort(jax.lax.stop_gradient(pre2))

            def side(pre, out, order_other, pseudo_other, wmap_other):
                clean = order_other[:k_clean]
                seg = jnp.mean(pre[clean])
                if k_clean < b:
                    # b and k_clean are static, so the empty-suspect case
                    # (only b == 1, where k_clean == b) is resolved at trace
                    # time — jnp.mean over an empty slice would be NaN.
                    suspect = order_other[k_clean:]
                    seg = seg + (1.0 - rate) * jnp.mean(pre[suspect])
                    cons_map = wmap_other * losses.multiclass_mse_loss(
                        out, pseudo_other, reduction="none"
                    )
                    cons_img = jnp.mean(cons_map, axis=(1, 2, 3))
                    cons = jnp.mean(cons_img[suspect])
                else:
                    cons = jnp.asarray(0.0, seg.dtype)
                return ct.seg_weight * seg + ct.consistency_weight * rate * cons

            loss1 = side(pre1, out1, order2, pseudo[1], wmap[1])
            loss2 = side(pre2, out2, order1, pseudo[0], wmap[0])
            total = loss1 + loss2
            aux = {
                "new_stats": new_stats,
                "loss1": loss1,
                "loss2": loss2,
                "dice1_sum": metrics.dice_fn(out1, t2, threshold=thr),
                "dice2_sum": metrics.dice_fn(out2, t1, threshold=thr),
            }
            return total, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads).replace(
            batch_stats=aux["new_stats"]
        )
        out_metrics = {
            "loss1": aux["loss1"],
            "loss2": aux["loss2"],
            "dice1_sum": aux["dice1_sum"],
            "dice2_sum": aux["dice2_sum"],
            "count": jnp.asarray(b, jnp.float32),
        }
        return new_state, out_metrics

    return step


# ----------------------------- evaluation -----------------------------


def make_eval_step(model, two_modal: bool, cfg: TrainConfig, dual: bool):
    """Test-batch loss/dice (no grads): the reference's test loop
    (:344-371). For dual states both nets are evaluated (net k vs the
    other's working labels, matching :360-366)."""
    forward = make_forward(model, two_modal)
    image_criterion = make_image_criterion(cfg)
    thr = cfg.eval.threshold

    if dual:

        @jax.jit
        def step(state: DualTrainState, batch):
            images = batch_images(batch, two_modal)
            t1, t2 = batch["target1"], batch["target2"]

            def fwd(params, stats):
                out, _ = forward(params, stats, images, False, False)
                return out

            outputs = jax.vmap(fwd)(state.params, state.batch_stats)
            out1, out2 = outputs[0], outputs[1]
            return {
                "loss1": jnp.mean(image_criterion(out1, t2)),
                "loss2": jnp.mean(image_criterion(out2, t1)),
                "dice1_sum": metrics.dice_fn(out1, t2, threshold=thr),
                "dice2_sum": metrics.dice_fn(out2, t1, threshold=thr),
                "count": jnp.asarray(t1.shape[0], jnp.float32),
            }

    else:
        criterion = make_criterion(cfg)

        @jax.jit
        def step(state: TrainState, batch):
            images = batch_images(batch, two_modal)
            target = batch["target"]
            logits, _ = forward(state.params, state.batch_stats, images, False, False)
            return {
                "loss": criterion(logits, target),
                "dice_sum": metrics.dice_fn(logits, target, threshold=thr),
                "count": jnp.asarray(target.shape[0], jnp.float32),
            }

    return step


def make_predict_step(model, two_modal: bool, dual: bool):
    """Batched slice inference: softmax-argmax label maps
    (the bs=1 loops at :403-415 / evalchaos_comparison_1cases.py:213-228,
    batched here). Returns (2, B, H, W) for dual or (B, H, W) labels.

    Labels come back as uint8, and BINARY label maps are bit-packed along
    the width axis (jnp.packbits, 8 pixels/byte): the case-eval passes
    fetch every predicted slice to the host, and on a tunneled chip the
    device->host transfer is the bottleneck. evaluation.case_eval
    transparently unpacks (packed width != height on square slices)."""
    forward = make_forward(model, two_modal)

    def _encode(labels):
        if labels.shape[-1] % 8 == 0:
            return jnp.packbits(labels.astype(jnp.uint8), axis=-1)
        return labels.astype(jnp.uint8)

    if dual:

        def predict(state: DualTrainState, batch):
            images = batch_images(batch, two_modal)

            def fwd(params, stats):
                out, _ = forward(params, stats, images, False, False)
                return out

            outputs = jax.vmap(fwd)(state.params, state.batch_stats)
            labels = jnp.argmax(outputs, axis=-1)
            if outputs.shape[-1] == 2:
                return _encode(labels)
            return labels.astype(jnp.uint8)

    else:

        def predict(state: TrainState, batch):
            images = batch_images(batch, two_modal)
            logits, _ = forward(state.params, state.batch_stats, images, False, False)
            labels = jnp.argmax(logits, axis=-1)
            if logits.shape[-1] == 2:
                return _encode(labels)
            return labels.astype(jnp.uint8)

    return jax.jit(predict)


def make_eval_predict_all(model, two_modal: bool, cfg: TrainConfig):
    """Test-set metrics AND case predictions in ONE device program (dual).

    The epoch loop historically ran the test slices through the model
    twice: once for batch loss/dice (:344-371) and once for the per-case
    label maps (:373-427) — both in eval mode, so the logits are the same.
    This program computes them together: one ``lax.map`` over an (N, B)
    index matrix into the device-resident test data, each row yielding the
    masked per-image loss/dice sums (``valid`` zeroes the padded tail of
    the final ragged batch) and the bit-packed argmax labels. One dispatch
    + one fetch replaces ~2 dispatches per eval batch plus a second full
    inference pass over the test set.

    Returns (totals, labels): totals with the keys/semantics of
    make_eval_step accumulated over the whole set (loss sums weighted per
    image, matching Trainer._accumulate's mean*count bookkeeping), labels
    shaped (N, 2, B, H, W/8) packed as in make_predict_step.
    """
    forward = make_forward(model, two_modal)
    image_criterion = make_image_criterion(cfg)
    thr = cfg.eval.threshold

    def _encode(labels):
        if labels.shape[-1] % 8 == 0:
            return jnp.packbits(labels.astype(jnp.uint8), axis=-1)
        return labels.astype(jnp.uint8)

    @jax.jit
    def run(state: DualTrainState, data, idx_mat, valid_mat):
        def one(args):
            idx, valid = args
            batch = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
            target = batch.pop("target").astype(jnp.int32)
            images = batch_images(batch, two_modal)

            def fwd(params, stats):
                out, _ = forward(params, stats, images, False, False)
                return out

            outputs = jax.vmap(fwd)(state.params, state.batch_stats)
            out1, out2 = outputs[0], outputs[1]
            d1, _ = metrics._dice_vector(out1, target, thr)
            d2, _ = metrics._dice_vector(out2, target, thr)
            totals = {
                "loss1": jnp.sum(image_criterion(out1, target) * valid),
                "loss2": jnp.sum(image_criterion(out2, target) * valid),
                "dice1_sum": jnp.sum(d1 * valid),
                "dice2_sum": jnp.sum(d2 * valid),
                "count": jnp.sum(valid),
            }
            labels = jnp.argmax(outputs, axis=-1)
            if outputs.shape[-1] == 2:
                return totals, _encode(labels)
            return totals, labels.astype(jnp.uint8)

        row_totals, labels = jax.lax.map(one, (idx_mat, valid_mat))
        totals = jax.tree_util.tree_map(
            lambda x: jnp.sum(x, axis=0), row_totals
        )
        return totals, labels

    return run


def make_predict_all(model, two_modal: bool, dual: bool):
    """Whole-eval-set inference as ONE device program.

    Takes the device-resident image data (data dict from
    SlicePipeline.to_device — image/scale/fill keys only) and an (N, B)
    index matrix; lax.map's the per-batch predict over the rows, gathering
    each batch ON DEVICE. One dispatch and one fetch replace ~2 dispatches
    per batch — on a tunneled chip the per-call submission overhead made
    the re-inference phase jitter by seconds. Returns (N, [2,] B, H, W/8)
    packed labels (same encoding as make_predict_step)."""
    predict = make_predict_step(model, two_modal, dual)

    @jax.jit
    def run(state, data, idx_mat):
        def one(idx):
            batch = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
            return predict(state, batch)

        return jax.lax.map(one, idx_mat)

    return run
