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
    harnesses score with the same metric instead of re-deriving it.
    count_nonzero throughout: these run once per case per net per epoch on
    the 1-core host, inside the epoch tail's critical path."""
    p = pred > 0
    t = target > 0
    union = np.count_nonzero(p) + np.count_nonzero(t)
    if union == 0:
        return 1.0
    return 2.0 * np.count_nonzero(p & t) / union


_dice3d_np = dice3d_np  # internal alias (pre-export call sites)


def _iou3d_np(pred: np.ndarray, target: np.ndarray) -> float:
    p = pred > 0
    t = target > 0
    inter = np.count_nonzero(p & t)
    union = np.count_nonzero(p) + np.count_nonzero(t) - inter
    if union == 0:
        return 1.0
    return inter / union


def _tp_tn_fp_fn_3d_np(pred: np.ndarray, target: np.ndarray):
    p = pred > 0
    t = target > 0
    tp = float(np.count_nonzero(p & t))
    fp = float(np.count_nonzero(p) - tp)
    fn = float(np.count_nonzero(t) - tp)
    tn = float(p.size - tp - fp - fn)
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


def pack_case_stream(pipe: SlicePipeline, cases: Sequence[str], batch_size: int):
    """Pack all cases' slice indices into one contiguous padded stream.

    Returns (case_ids, counts, n, padded): the stream concatenates each
    case's sorted indices, then repeats the last index to a multiple of
    ``batch_size`` — one pad at the very end instead of one per case."""
    case_ids = [str(c) for c in cases]
    all_idx: List[int] = []
    counts: List[int] = []
    for case in case_ids:
        idxs = pipe.case_indices(case)
        all_idx.extend(idxs)
        counts.append(len(idxs))
    n = len(all_idx)
    pad = (-n) % batch_size if n else 0
    padded = np.asarray(all_idx + all_idx[-1:] * pad if n else [], np.int64)
    return case_ids, counts, n, padded


def _unpack_width_bits(preds: np.ndarray, img_size: int) -> np.ndarray:
    """Undo make_predict_step's binary bit-packing (width axis, 8 px/byte)
    when present — packed width differs from img_size on square slices."""
    if preds.shape[-1] * 8 == img_size:
        return np.unpackbits(preds, axis=-1, count=img_size)
    return preds


def _postprocess_case(preds: np.ndarray, keep_largest_cc: bool):
    """(n_nets, S, H, W) prediction stack -> {net: (S, H, W) uint8}."""
    vols = {}
    for net in range(preds.shape[0]):
        vol = preds[net].astype(np.uint8)
        if keep_largest_cc:
            vol = keep_largest_connected_components(vol)
        vols[net] = vol
    return vols


def start_case_inference(
    predict_step: Callable,
    state,
    pipe: SlicePipeline,
    cases: Sequence[str],
    batch_size: int,
    dual: bool,
    keep_largest_cc: bool = True,
    predict_all: Optional[Callable] = None,
    timing: Optional[Dict[str, float]] = None,
    pipeline_chunks: int = 4,
) -> Callable[[], List[Dict[int, np.ndarray]]]:
    """DISPATCH case inference now; return a closure that finishes it.

    The device program(s) are submitted asynchronously before this returns,
    so the caller can overlap other host work (or dispatch further device
    programs) with the inference; calling the returned closure fetches the
    predictions and runs the host post-processing (bit-unpack + largest-CC),
    returning the list of per-case volume dicts of ``infer_cases``.

    On the single-program ``predict_all`` path the index matrix is split
    into up to ``pipeline_chunks`` row chunks dispatched back to back: the
    device->host transfer and the host CC of chunk k overlap the device
    compute of chunks k+1.. (one extra compile for the second row-count at
    most — np.array_split keeps chunk sizes within 1 row of each other).
    Complete cases are post-processed as soon as their slices have landed.

    ``timing``, when given, accumulates "fetch" (dispatch + device compute
    + the device->host prediction transfer, one bucket — the tunneled
    backend's block_until_ready returns early, so compute and transfer
    cannot be separated; link health is the variable part) and "host"
    (bit-unpack + connected components + metrics on the single host core,
    sensitive to host load) so epoch logs can attribute time_cases drift.
    """
    import time

    from aide_tpu.core.mesh import fetch

    case_ids, counts, n, padded = pack_case_stream(pipe, cases, batch_size)
    if n == 0:
        return lambda: []

    t0 = time.perf_counter()
    if predict_all is not None and pipe.device_image_data is not None:
        # the eval set as one or a few device programs (lax.map over
        # batches, gathering on device) — per-call submission overhead on a
        # tunneled chip otherwise costs seconds
        idx_mat = np.asarray(padded.reshape(-1, batch_size), np.int32)
        # chunk only sets big enough that per-chunk device compute hides
        # the extra fetch round trips (~0.25 s each on a tunneled chip);
        # small sets (single-volume latency path) stay one program/fetch
        n_chunks = max(1, min(pipeline_chunks, idx_mat.shape[0] // 4))
        pending = [
            predict_all(state, pipe.device_image_data, rows)
            for rows in np.array_split(idx_mat, n_chunks)
        ]  # each (R, 2, B, H, Wp) dual / (R, B, H, Wp) single

        def to_stream(out) -> np.ndarray:
            out = np.asarray(out)
            if dual:
                return np.moveaxis(out, 1, 0).reshape(2, -1, *out.shape[3:])
            return out.reshape(1, -1, *out.shape[2:])

    else:
        # per-batch dispatch (host-batch pipelines / sharded mesh caches):
        # all batches submitted before any fetch, then ONE batched
        # device->host transfer — per-array fetches would each pay a round
        # trip on a tunneled chip (measured ~37x slower)
        pending = [[
            predict_step(
                state,
                pipe.batch_at(padded[s : s + batch_size], images_only=True),
            )
            for s in range(0, len(padded), batch_size)
        ]]

        def to_stream(out_list) -> np.ndarray:
            chunks = [
                np.asarray(p) if dual else np.asarray(p)[None]
                for p in out_list
            ]  # each (n_nets, B, H, W) — or (n_nets, B, H, W/8) bit-packed
            return np.concatenate(chunks, axis=1)

    dispatch_t = time.perf_counter() - t0

    def finish() -> List[Dict[int, np.ndarray]]:
        fetch_t = dispatch_t
        host_t = 0.0
        volumes: List[Dict[int, np.ndarray]] = []
        buf: List[np.ndarray] = []  # per-chunk (n_nets, S_k, H, W) streams
        buffered = 0  # slices in buf not yet assigned to a case
        consumed = 0  # cases fully post-processed
        produced = 0  # total stream slices fetched so far (incl. padding)

        def drain():
            """Post-process every case whose slices have fully landed."""
            nonlocal buf, buffered, consumed
            ready = 0
            while (
                consumed < len(counts)
                and buffered - ready >= counts[consumed]
            ):
                ready += counts[consumed]
                consumed += 1
            if ready == 0:
                return
            stream = buf[0] if len(buf) == 1 else np.concatenate(buf, axis=1)
            offset = 0
            for case_i in range(len(volumes), consumed):
                cnt = counts[case_i]
                volumes.append(
                    _postprocess_case(
                        stream[:, offset : offset + cnt], keep_largest_cc
                    )
                )
                offset += cnt
            buf = [stream[:, ready:]]
            buffered -= ready

        for p in pending:
            t1 = time.perf_counter()
            out = fetch(p)  # blocks on THIS chunk only
            fetch_t += time.perf_counter() - t1
            t1 = time.perf_counter()
            stream = _unpack_width_bits(to_stream(out), pipe.img_size)
            take = min(stream.shape[1], n - produced)  # drop final pad tail
            stream = stream[:, :take]
            produced += take
            if stream.shape[1]:
                buf.append(stream)
                buffered += stream.shape[1]
                drain()  # CC of landed cases overlaps the next chunk
            host_t += time.perf_counter() - t1
        assert consumed == len(counts), (consumed, len(counts))
        if timing is not None:
            timing["fetch"] = timing.get("fetch", 0.0) + fetch_t
            timing["host"] = timing.get("host", 0.0) + host_t
        return volumes

    return finish


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
    instead of one padded dispatch per case chunk (start_case_inference is
    the dispatch/finish split of the same computation)."""
    return start_case_inference(
        predict_step, state, pipe, cases, batch_size, dual, keep_largest_cc,
        predict_all=predict_all, timing=timing,
    )()


def score_case_volumes(
    pipe: SlicePipeline,
    cases: Sequence[str],
    volumes: List[Dict[int, np.ndarray]],
    dual: bool,
    target_net: Union[int, str, None] = None,
    full_metrics: bool = False,
    keep_volumes: bool = False,
    timing: Optional[Dict[str, float]] = None,
) -> Dict[int, List[CaseResult]]:
    """Score predicted case volumes into per-net CaseResult lists (the
    host-metric half of evaluate_cases)."""
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


def start_case_evaluation(
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
) -> Callable[[], Dict[int, List[CaseResult]]]:
    """DISPATCH the inference of evaluate_cases now; return a closure that
    fetches, post-processes, and scores. Lets the caller overlap other
    device programs or host work with the inference (see
    start_case_inference)."""
    finish_infer = start_case_inference(
        predict_step, state, pipe, cases, batch_size, dual, keep_largest_cc,
        predict_all=predict_all, timing=timing,
    )

    def finish() -> Dict[int, List[CaseResult]]:
        return score_case_volumes(
            pipe, cases, finish_infer(), dual, target_net=target_net,
            full_metrics=full_metrics, keep_volumes=keep_volumes,
            timing=timing,
        )

    return finish


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
    return start_case_evaluation(
        predict_step, state, pipe, cases, batch_size, dual,
        target_net=target_net, keep_largest_cc=keep_largest_cc,
        full_metrics=full_metrics, keep_volumes=keep_volumes,
        predict_all=predict_all, timing=timing,
    )()
