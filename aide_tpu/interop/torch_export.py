"""Export aide_tpu Flax variables as reference-loadable torch checkpoints.

The inverse of ``torch_import``: reference users can evaluate a model
trained here with their own scripts (``torch.load`` of
``{'net': state_dict, 'loss': ..., 'epoch': ...}`` —
/root/reference/train_files/evalchaos_comparison_1cases.py:154-157,
checkpoint dict layout at trainchaos_proposed_30cases1labeled.py:505-511).
Name/layout mapping is shared with the import direction
(``torch_import._build_name_map``); writing the file uses the torch CPU
wheel when available (reading reference checkpoints never needs torch —
see ``torch_pickle``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from aide_tpu.interop.torch_import import _build_name_map


def _get(tree: Dict, path, leaf: str, model_name: str) -> np.ndarray:
    node = tree
    walked = []
    for p in path + (leaf,):
        walked.append(p)
        if not isinstance(node, dict) or p not in node:
            raise KeyError(
                f"variables have no {'/'.join(walked)!r} (model "
                f"{model_name!r}); only norm='batch' models map onto the "
                f"reference's BatchNorm checkpoints"
            )
        node = node[p]
    return np.asarray(node, dtype=np.float32)


def variables_to_state_dict(
    variables: Dict[str, Any],
    model_name: str,
    learned_bilinear: bool = False,
) -> Dict[str, np.ndarray]:
    """``{'params': ..., 'batch_stats': ...}`` -> reference ``state_dict``."""
    name_map = _build_name_map(model_name, learned_bilinear)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}

    for path, (theirs, kind) in name_map.items():
        if kind == "conv":
            # HWIO -> OIHW
            sd[f"{theirs}.weight"] = np.transpose(
                _get(params, path, "kernel", model_name), (3, 2, 0, 1)
            )
            sd[f"{theirs}.bias"] = _get(params, path, "bias", model_name)
        elif kind == "convT":
            # flax (kh, kw, in, out) correlating -> torch (in, out, kh, kw)
            # convolving: unflip the spatial taps, then transpose
            k = _get(params, path, "kernel", model_name)[::-1, ::-1]
            sd[f"{theirs}.weight"] = np.transpose(k, (2, 3, 0, 1))
            sd[f"{theirs}.bias"] = _get(params, path, "bias", model_name)
        elif kind == "dense":
            sd[f"{theirs}.weight"] = np.transpose(
                _get(params, path, "kernel", model_name), (1, 0)
            )
            sd[f"{theirs}.bias"] = _get(params, path, "bias", model_name)
        elif kind == "bn":
            sd[f"{theirs}.weight"] = _get(params, path, "scale", model_name)
            sd[f"{theirs}.bias"] = _get(params, path, "bias", model_name)
            sd[f"{theirs}.running_mean"] = _get(stats, path, "mean", model_name)
            sd[f"{theirs}.running_var"] = _get(stats, path, "var", model_name)
            sd[f"{theirs}.num_batches_tracked"] = np.asarray(0, np.int64)
        else:  # pragma: no cover
            raise AssertionError(kind)
    return sd


def export_reference_checkpoint(
    path: str,
    variables: Dict[str, Any],
    model_name: str,
    learned_bilinear: bool = False,
    meta: Optional[Dict[str, Any]] = None,
) -> None:
    """Write a ``torch.load``-able ``.pkl`` in the reference's checkpoint
    layout (``{'net': state_dict, 'loss': ..., 'epoch': ...}``)."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "exporting a reference .pkl needs the torch (CPU) wheel to "
            "write torch's serialization format; importing .pkl files "
            "remains torch-free"
        ) from e

    sd = variables_to_state_dict(variables, model_name, learned_bilinear)
    tsd = {
        k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()
    }
    payload = {"net": tsd}
    payload.update(meta or {"loss": 0.0, "epoch": 0})
    torch.save(payload, path)
