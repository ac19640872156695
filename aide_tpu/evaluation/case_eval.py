"""Case-wise 3D inference and metrics.

Replaces the reference's per-slice bs=1 eval loops
(/root/reference/train_files/trainchaos_proposed_30cases1labeled.py:373-496,
evalchaos_comparison_1cases.py:143-243) with batched slice inference through
the jitted predict step (padded per-case batches, static shapes), followed by
host-side keep-largest-connected-component post-processing and volume
metrics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Union

import numpy as np

from aide_tpu.data.pipeline import SlicePipeline
from aide_tpu.ops.cc import keep_largest_connected_components


# Host-side NumPy versions of the 3D metrics (same conventions as
# ops/metrics.py dice3d/iou3d/tp_tn_fp_fn_3d: foreground > 0, union-0 => 1).
# The jnp versions would dispatch a tiny device program per case — on a
# tunneled chip that is a network round trip per metric per case.


def dice3d_np(pred: np.ndarray, target: np.ndarray) -> float:
    """Host-side whole-volume Dice (foreground > 0; empty union = 1.0) —
    THE convention the golden-parity tests pin. Exported so experiment
    harnesses score with the same metric instead of re-deriving it."""
    p = pred.reshape(-1) > 0
    t = target.reshape(-1) > 0
    union = float(p.sum()) + float(t.sum())
    if union == 0:
        return 1.0
    return 2.0 * float(np.sum(p & t)) / union


_dice3d_np = dice3d_np  # internal alias (pre-export call sites)


def _iou3d_np(pred: np.ndarray, target: np.ndarray) -> float:
    p = pred.reshape(-1) > 0
    t = target.reshape(-1) > 0
    inter = float(np.sum(p & t))
    union = float(p.sum()) + float(t.sum()) - inter
    if union == 0:
        return 1.0
    return inter / union


def _tp_tn_fp_fn_3d_np(pred: np.ndarray, target: np.ndarray):
    p = pred.reshape(-1) > 0
    t = target.reshape(-1) > 0
    tp = float(np.sum(p & t))
    tn = float(np.sum(~p & ~t))
    fp = float(np.sum(p & ~t))
    fn = float(np.sum(~p & t))
    return tp, tn, fp, fn


@dataclass
class CaseResult:
    case_id: str
    dice: float
    iou: float = 0.0
    tp: float = 0.0
    tn: float = 0.0
    fp: float = 0.0
    fn: float = 0.0
    pred_volume: Optional[np.ndarray] = None  # (S, H, W) uint8 post-CC


def infer_cases(
    predict_step: Callable,
    state,
    pipe: SlicePipeline,
    cases: Sequence[str],
    batch_size: int,
    dual: bool,
    keep_largest_cc: bool = True,
    predict_all: Optional[Callable] = None,
    timing: Optional[Dict[str, float]] = None,
) -> List[Dict[int, np.ndarray]]:
    """Predicted volumes per case. Returns a list aligned with ``cases`` of
    {net_index: (S, H, W) uint8} (net_index 0 for single nets).

    All cases' slices are packed into one contiguous index stream and run as
    fixed-size batches (one pad at the very end), then split back per case —
    instead of one padded dispatch per case chunk. Batches are dispatched
    before any fetch, so device execution overlaps the host loop.

    ``timing``, when given, accumulates "fetch" (dispatch + device compute
    + the device->host prediction transfer, one bucket — the tunneled
    backend's block_until_ready returns early, so compute and transfer
    cannot be separated; link health is the variable part) and "host"
    (bit-unpack + connected components + metrics on the single host core,
    sensitive to host load) so epoch logs can attribute time_cases drift.
    """
    case_ids = [str(c) for c in cases]
    all_idx: List[int] = []
    counts: List[int] = []
    for case in case_ids:
        idxs = pipe.case_indices(case)
        all_idx.extend(idxs)
        counts.append(len(idxs))

    n = len(all_idx)
    if n == 0:
        return []
    pad = (-n) % batch_size
    padded = np.asarray(all_idx + [all_idx[-1]] * pad)

    import time

    import jax

    from aide_tpu.core.mesh import fetch

    t0 = time.perf_counter()
    if predict_all is not None and pipe.device_image_data is not None:
        # the WHOLE eval set as one device program (lax.map over batches,
        # gathering on device) — one dispatch + one fetch; per-call
        # submission overhead on a tunneled chip otherwise costs seconds
        idx_mat = np.asarray(
            padded.reshape(-1, batch_size), np.int32
        )
        out = np.asarray(
            fetch(
                predict_all(state, pipe.device_image_data, idx_mat)
            )
        )  # (N, 2, B, H, Wp) dual / (N, B, H, Wp) single
        if dual:
            preds = np.moveaxis(out, 1, 0).reshape(2, -1, *out.shape[3:])
        else:
            preds = out.reshape(1, -1, *out.shape[2:])
        preds = preds[:, :n]
    else:
        # dispatch every batch first (async), then fetch ALL results in
        # one batched device->host transfer — per-array fetches would each
        # pay a round trip on a tunneled chip (measured ~37x slower)
        pending = [
            predict_step(
                state,
                pipe.batch_at(padded[s : s + batch_size], images_only=True),
            )
            for s in range(0, len(padded), batch_size)
        ]
        fetched = fetch(pending)
        chunks = [
            np.asarray(p) if dual else np.asarray(p)[None] for p in fetched
        ]  # each (n_nets, B, H, W) — or (n_nets, B, H, W/8) bit-packed
        preds = np.concatenate(chunks, axis=1)[:, :n]
    if timing is not None:
        timing["fetch"] = timing.get("fetch", 0.0) + time.perf_counter() - t0
        t0 = time.perf_counter()
    if preds.shape[-1] * 8 == pipe.img_size:
        # binary labels arrive bit-packed along width (engine/steps.py
        # make_predict_step: 8x smaller device->host fetch); unpack on host
        preds = np.unpackbits(preds, axis=-1, count=pipe.img_size)

    out = []
    offset = 0
    for count in counts:
        vols = {}
        for net in range(preds.shape[0]):
            vol = preds[net, offset : offset + count].astype(np.uint8)
            if keep_largest_cc:
                vol = keep_largest_connected_components(vol)
            vols[net] = vol
        out.append(vols)
        offset += count
    if timing is not None:
        timing["host"] = timing.get("host", 0.0) + time.perf_counter() - t0
    return out


def evaluate_cases(
    predict_step: Callable,
    state,
    pipe: SlicePipeline,
    cases: Sequence[str],
    batch_size: int,
    dual: bool,
    target_net: Union[int, str, None] = None,
    keep_largest_cc: bool = True,
    full_metrics: bool = False,
    keep_volumes: bool = False,
    predict_all: Optional[Callable] = None,
    timing: Optional[Dict[str, float]] = None,
) -> Dict[int, List[CaseResult]]:
    """Per-case 3D Dice (and optionally IoU/confusion counts) for each net.

    ``target_net``: None scores against ground truth; 1/2 scores net k
    against its own working labels (the train-loop convention at :488-489
    where generated masks are compared to the current labels). For dual
    states each net is scored against working labels of the matching net
    when target_net == 'self'.
    """
    volumes = infer_cases(
        predict_step, state, pipe, cases, batch_size, dual, keep_largest_cc,
        predict_all=predict_all, timing=timing,
    )
    import time

    t0 = time.perf_counter()
    results: Dict[int, List[CaseResult]] = {}
    n_nets = 2 if dual else 1
    for net in range(n_nets):
        per_case = []
        for case, vols in zip(cases, volumes):
            pred = vols[net]
            if target_net == "self":
                # net k vs its own working labels; fall back to ground
                # truth when the pipe carries no working labels
                net_sel = (net + 1) if pipe.labels is not None else None
                target = pipe.case_targets(str(case), net=net_sel)
            else:
                target = pipe.case_targets(str(case), net=target_net)
            dice = _dice3d_np(pred, target)
            r = CaseResult(case_id=str(case), dice=dice)
            if full_metrics:
                r.iou = _iou3d_np(pred, target)
                r.tp, r.tn, r.fp, r.fn = _tp_tn_fp_fn_3d_np(pred, target)
            if keep_volumes:
                r.pred_volume = pred
            per_case.append(r)
        results[net] = per_case
    if timing is not None:
        timing["host"] = timing.get("host", 0.0) + time.perf_counter() - t0
    return results
