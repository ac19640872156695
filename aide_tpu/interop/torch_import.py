"""Map reference torch ``state_dict``s into aide_tpu Flax variables.

The reference's eval workflow loads torch-pickled checkpoints of its model
zoo (/root/reference/train_files/evalchaos_comparison_1cases.py:154-157,
252-254). This module converts such a ``state_dict`` (NumPy arrays, as
returned by ``torch_pickle.load_torch_pickle``) into the matching aide_tpu
model's ``{'params': ..., 'batch_stats': ...}`` tree:

* names: the reference's attribute paths (``modal1_downblock3.block.conv1``)
  -> our Flax module paths (``modal1_block3/Conv_0``), per model family;
* layouts: Conv2d OIHW -> HWIO, ConvTranspose2d IOHW -> HWIO,
  Linear (out, in) -> Dense (in, out); BN weight/bias -> scale/bias,
  running stats -> the ``batch_stats`` collection; ``num_batches_tracked``
  is dropped (stateless momentum EMA here).

Supported families: ``unet``/``unet{2..128}``/``unetsa`` (reference
models_singlemodalinput/UNet.py) and ``fuseunet``/``fuseunetsa``/
``fuseunetsaseparate`` (models_twomodalinputs/fuseunet.py).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from aide_tpu.interop.torch_pickle import load_torch_pickle

# ------------------------- sub-block name tables -------------------------

# ConvBlock (ours) <-> basic_block (theirs, netblocks.py:21-33)
_CONV_BLOCK = {
    ("Conv_0",): ("conv1", "conv"),
    ("Norm_0", "BatchNorm_0"): ("bn1", "bn"),
    ("Conv_1",): ("conv2", "conv"),
    ("Norm_1", "BatchNorm_0"): ("bn2", "bn"),
}

# SpatialAttention (ours) <-> Spatial_Attention (theirs, netblocks.py:68-98)
_SA_BLOCK = {
    ("Conv_0",): ("conv1", "conv"),
    ("Conv_1",): ("conv2", "conv"),
    ("Conv_2",): ("conv3", "conv"),
    ("Conv_3",): ("conv4", "conv"),
    ("Norm_0", "BatchNorm_0"): ("bn", "bn"),
}


def _upsample_conv(learned_bilinear: bool):
    # UpsampleConv (ours) <-> UNet_up_conv_bn_relu Sequential (theirs):
    # bilinear: [Upsample, Conv2d, BN, ReLU]; learned: [ConvT, BN, ReLU]
    if learned_bilinear:
        return {
            ("ConvTranspose_0",): ("0", "convT"),
            ("Norm_0", "BatchNorm_0"): ("1", "bn"),
        }
    return {
        ("Conv_0",): ("1", "conv"),
        ("Norm_0", "BatchNorm_0"): ("2", "bn"),
    }


def _up_block(learned_bilinear: bool):
    table = {}
    for sub, (t, kind) in _upsample_conv(learned_bilinear).items():
        table[("UpsampleConv_0",) + sub] = (f"bilinear_up.{t}", kind)
    for sub, (t, kind) in _CONV_BLOCK.items():
        table[("ConvBlock_0",) + sub] = (f"block.{t}", kind)
    return table


def _prefix(table: Dict, ours: str, theirs: str) -> Dict:
    return {
        (ours,) + sub: (f"{theirs}.{t}", kind) for sub, (t, kind) in table.items()
    }


def _build_name_map(model_name: str, learned_bilinear: bool) -> Dict:
    """{our params path tuple (module part): (their prefix, kind)}."""
    table: Dict[Tuple[str, ...], Tuple[str, str]] = {}
    up = _up_block(learned_bilinear)

    if model_name.startswith("fuseunet"):
        for k in range(1, 6):
            table.update(
                _prefix(_CONV_BLOCK, f"modal1_block{k}", f"modal1_downblock{k}.block")
            )
            table.update(
                _prefix(_CONV_BLOCK, f"modal2_block{k}", f"modal2_downblock{k}.block")
            )
            if model_name in ("fuseunetsa", "fuseunetsaseparate"):
                table.update(_prefix(_SA_BLOCK, f"modal1_sa{k}", f"modal1_sa{k}"))
                table.update(_prefix(_SA_BLOCK, f"modal2_sa{k}", f"modal2_sa{k}"))
        for j in range(1, 5):
            table.update(_prefix(up, f"up_block{j}", f"up_block{j}"))
        table[("Conv_0",)] = ("last_conv1", "conv")
        return table

    if model_name.startswith("unet"):
        for k in range(1, 6):
            sub = _prefix(_CONV_BLOCK, "ConvBlock_0", "block")
            for s, (t, kind) in sub.items():
                table[(f"down_block{k}",) + s] = (f"down_block{k}.{t}", kind)
            if model_name == "unetsa":
                table.update(_prefix(_SA_BLOCK, f"SpatialAttention_{k - 1}", f"sa{k}"))
        for j in range(1, 5):
            table.update(_prefix(up, f"up_block{j}", f"up_block{j}"))
        table[("Conv_0",)] = ("last_conv1", "conv")
        return table

    raise ValueError(f"no torch-import mapping for model {model_name!r}")


# ----------------------------- layout moves -----------------------------


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _convT_kernel(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d weight is (in, out, kh, kw); flax ConvTranspose
    # kernels are (kh, kw, in, out) and correlate rather than convolve, so
    # the spatial taps flip.
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))  # (out, in) -> (in, out)


def state_dict_to_variables(
    state_dict: Dict[str, np.ndarray],
    model_name: str,
    learned_bilinear: bool = False,
) -> Dict[str, Any]:
    """Reference ``state_dict`` -> ``{'params': ..., 'batch_stats': ...}``."""
    name_map = _build_name_map(model_name, learned_bilinear)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    used = set()

    def put(tree, path, leaf_name, value):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf_name] = value

    def take(name):
        if name not in state_dict:
            raise KeyError(
                f"reference checkpoint is missing {name!r} (model "
                f"{model_name!r}; has e.g. {sorted(state_dict)[:3]})"
            )
        used.add(name)
        return np.asarray(state_dict[name])

    for path, (theirs, kind) in name_map.items():
        if kind == "conv":
            put(params, path, "kernel", _conv_kernel(take(f"{theirs}.weight")))
            put(params, path, "bias", take(f"{theirs}.bias"))
        elif kind == "convT":
            put(params, path, "kernel", _convT_kernel(take(f"{theirs}.weight")))
            put(params, path, "bias", take(f"{theirs}.bias"))
        elif kind == "dense":
            put(params, path, "kernel", _dense_kernel(take(f"{theirs}.weight")))
            put(params, path, "bias", take(f"{theirs}.bias"))
        elif kind == "bn":
            put(params, path, "scale", take(f"{theirs}.weight"))
            put(params, path, "bias", take(f"{theirs}.bias"))
            put(stats, path, "mean", take(f"{theirs}.running_mean"))
            put(stats, path, "var", take(f"{theirs}.running_var"))
            used.add(f"{theirs}.num_batches_tracked")
        else:  # pragma: no cover
            raise AssertionError(kind)

    leftover = [
        k for k in state_dict
        if k not in used and not k.endswith("num_batches_tracked")
    ]
    if leftover:
        raise ValueError(
            f"unmapped reference parameters for {model_name!r}: "
            f"{sorted(leftover)[:8]}"
        )
    return {"params": params, "batch_stats": stats}


def import_reference_checkpoint(
    path: str, model_name: str, learned_bilinear: bool = False
) -> Dict[str, Any]:
    """Load a reference ``.pkl`` checkpoint into aide_tpu variables.

    Accepts either a bare ``state_dict`` or the trainer's
    ``{'net': state_dict, ...}`` wrapper
    (trainchaos_proposed_30cases1labeled.py:505-511).
    """
    obj = load_torch_pickle(path)
    if isinstance(obj, dict) and "net" in obj and not _is_state_dict(obj):
        obj = obj["net"]
    if not _is_state_dict(obj):
        raise ValueError(
            f"{path!r} does not contain a state_dict (top-level keys: "
            f"{list(obj)[:6] if isinstance(obj, dict) else type(obj)})"
        )
    return state_dict_to_variables(obj, model_name, learned_bilinear)


def _is_state_dict(obj) -> bool:
    return isinstance(obj, dict) and obj and all(
        isinstance(v, np.ndarray) for v in obj.values()
    )
