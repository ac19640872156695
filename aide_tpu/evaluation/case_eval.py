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
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from aide_tpu.data.pipeline import SlicePipeline
from aide_tpu.ops.cc import keep_largest_connected_components
from aide_tpu.ops import metrics as M


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
) -> List[Dict[int, np.ndarray]]:
    """Predicted volumes per case. Returns a list aligned with ``cases`` of
    {net_index: (S, H, W) uint8} (net_index 0 for single nets)."""
    # dispatch every batch first (async device execution), fetch afterwards —
    # a synchronous fetch per batch would serialize on link latency
    pending = []
    for case in cases:
        for batch, valid in pipe.case_batches(str(case), batch_size):
            pending.append((case, valid, predict_step(state, batch)))

    out = []
    per_net: Dict[int, List[np.ndarray]] = {}
    current = None

    def flush():
        vols = {}
        for net, chunks in per_net.items():
            vol = np.concatenate(chunks, axis=0).astype(np.uint8)
            if keep_largest_cc:
                vol = keep_largest_connected_components(vol)
            vols[net] = vol
        out.append(vols)
        per_net.clear()

    for case, valid, dev_pred in pending:
        if current is not None and case != current:
            flush()
        current = case
        pred = np.asarray(dev_pred)  # (2,B,H,W) or (B,H,W)
        if not dual:
            pred = pred[None]
        for net in range(pred.shape[0]):
            per_net.setdefault(net, []).append(pred[net][valid])
    if current is not None:
        flush()
    return out


def evaluate_cases(
    predict_step: Callable,
    state,
    pipe: SlicePipeline,
    cases: Sequence[str],
    batch_size: int,
    dual: bool,
    target_net: Optional[int] = None,
    keep_largest_cc: bool = True,
    full_metrics: bool = False,
    keep_volumes: bool = False,
) -> Dict[int, List[CaseResult]]:
    """Per-case 3D Dice (and optionally IoU/confusion counts) for each net.

    ``target_net``: None scores against ground truth; 1/2 scores net k
    against its own working labels (the train-loop convention at :488-489
    where generated masks are compared to the current labels). For dual
    states each net is scored against working labels of the matching net
    when target_net == 'self'.
    """
    volumes = infer_cases(
        predict_step, state, pipe, cases, batch_size, dual, keep_largest_cc
    )
    results: Dict[int, List[CaseResult]] = {}
    n_nets = 2 if dual else 1
    for net in range(n_nets):
        per_case = []
        for case, vols in zip(cases, volumes):
            pred = vols[net]
            if target_net == "self" and pipe.labels is not None:
                target = pipe.case_targets(str(case), net=net + 1)
            else:
                target = pipe.case_targets(str(case), net=target_net)
            dice = float(M.dice3d(pred, target))
            r = CaseResult(case_id=str(case), dice=dice)
            if full_metrics:
                r.iou = float(M.iou3d(pred, target))
                tp, tn, fp, fn = M.tp_tn_fp_fn_3d(pred, target)
                r.tp, r.tn, r.fp, r.fn = float(tp), float(tn), float(fp), float(fn)
            if keep_volumes:
                r.pred_volume = pred
            per_case.append(r)
        results[net] = per_case
    return results
