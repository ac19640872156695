"""Torch-free reader for ``torch.save`` checkpoint files.

The reference ships/loads torch-pickled models
(/root/reference/train_files/evalchaos_comparison_1cases.py:252-254;
downloadable trained weights, /root/reference/README.md:41-42). aide_tpu
must be able to consume those on a TPU host with no torch installed, so this
module parses both ``torch.save`` container formats with the stdlib only:

* zip format (torch >= 1.6 default): a zipfile holding ``<name>/data.pkl``
  (the object pickle, with persistent ids referencing storages) and raw
  little-endian storage payloads under ``<name>/data/<key>``.
* legacy streaming format: magic/protocol/sysinfo pickles, the object
  pickle, a pickled list of storage keys, then per key an int64 element
  count followed by the raw storage bytes.

Security: unpickling is restricted to a whitelist of reconstruction helpers
(tensor rebuilds, OrderedDict, numpy scalars); anything else raises. Tensors
are returned as NumPy arrays (bfloat16 via ml_dtypes); device locations
("cuda:0" etc.) are ignored.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any, BinaryIO, Dict, Tuple

import numpy as np

try:  # ml_dtypes ships with jax; bfloat16 storages need it
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BFLOAT16 = None

_MAGIC_NUMBER = 0x1950A86A20F9469CFC6C
_PROTOCOL_VERSION = 1001

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype(np.float32),
    "DoubleStorage": np.dtype(np.float64),
    "HalfStorage": np.dtype(np.float16),
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
}
if _BFLOAT16 is not None:
    _STORAGE_DTYPES["BFloat16Storage"] = _BFLOAT16


class _StorageType:
    """Marker for ``torch.FloatStorage`` & co. met inside the pickle."""

    def __init__(self, name: str):
        self.name = name
        if name not in _STORAGE_DTYPES:
            raise ValueError(f"unsupported torch storage type {name!r}")
        self.dtype = _STORAGE_DTYPES[name]


def _rebuild_tensor_v2(
    storage, storage_offset, size, stride, requires_grad=False,
    backward_hooks=None, metadata=None,
):
    """torch._utils._rebuild_tensor_v2 -> ndarray VIEW into the storage.

    Must stay a view: in the legacy format the storage payload bytes arrive
    AFTER the object pickle, so the buffers are filled in place later.
    ``load_torch_pickle`` deep-copies everything at the end.
    """
    flat = storage[storage_offset:]
    if not size:
        return flat[:1].reshape(())
    itemsize = flat.dtype.itemsize
    strides = tuple(int(s) * itemsize for s in stride)
    return np.lib.stride_tricks.as_strided(flat, shape=tuple(size), strides=strides)


def _finalize(obj):
    """Deep-copy storage views into owned, C-contiguous arrays."""
    if isinstance(obj, np.ndarray):
        return np.array(obj)
    if isinstance(obj, dict):
        return {k: _finalize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_finalize(v) for v in obj)
    return obj


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


class _SkipDtype:
    """Stand-in for torch.dtype attributes referenced by some pickles."""

    def __init__(self, name):
        self.name = name


_ALLOWED = {
    ("collections", "OrderedDict"): dict,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_tensor"): lambda storage, offset, size, stride: (
        _rebuild_tensor_v2(storage, offset, size, stride)
    ),
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("torch", "Size"): tuple,
}


class _TorchUnpickler(pickle.Unpickler):
    """Whitelist unpickler resolving torch persistent storage ids."""

    def __init__(self, fh: BinaryIO, storage_loader):
        super().__init__(fh)
        self._load_storage = storage_loader

    def find_class(self, module: str, name: str):
        if (module, name) in _ALLOWED:
            return _ALLOWED[(module, name)]
        if module == "torch" and name.endswith("Storage"):
            return _StorageType(name)
        if module == "torch" and name in (
            "float32", "float64", "float16", "bfloat16", "int64", "int32",
            "int16", "int8", "uint8", "bool",
        ):
            return _SkipDtype(name)
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name} (not on the torch "
            "checkpoint whitelist)"
        )

    def persistent_load(self, pid: Tuple):
        if not isinstance(pid, tuple) or not pid or pid[0] != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        # ('storage', storage_type, key, location, numel[, view_metadata])
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        return self._load_storage(str(key), storage_type, int(numel))


# ------------------------------ zip format ------------------------------


def _load_zip(fh: BinaryIO) -> Any:
    zf = zipfile.ZipFile(fh)
    names = zf.namelist()
    pkl_name = next(n for n in names if n.endswith("/data.pkl"))
    prefix = pkl_name[: -len("data.pkl")]
    cache: Dict[str, np.ndarray] = {}

    def storage_loader(key: str, stype: _StorageType, numel: int) -> np.ndarray:
        if key not in cache:
            raw = zf.read(f"{prefix}data/{key}")
            cache[key] = np.frombuffer(raw, dtype=stype.dtype, count=numel)
        return cache[key]

    with zf.open(pkl_name) as pfh:
        return _TorchUnpickler(io.BytesIO(pfh.read()), storage_loader).load()


# ----------------------------- legacy format -----------------------------


class _MetaUnpickler(pickle.Unpickler):
    """For the legacy header/trailer pickles (magic, protocol, sys_info,
    storage keys): these hold only primitives, so ANY global reference is
    refused. The security contract (module docstring) must hold from the
    very first byte parsed — a plain ``pickle.load`` here would execute a
    malicious ``__reduce__`` payload before the magic check ever ran."""

    def find_class(self, module: str, name: str):
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name} in torch legacy metadata"
        )

    def persistent_load(self, pid):
        raise pickle.UnpicklingError(f"unexpected persistent id {pid!r}")


def _meta_load(fh: BinaryIO) -> Any:
    return _MetaUnpickler(fh).load()


def _load_legacy(fh: BinaryIO) -> Any:
    magic = _meta_load(fh)
    if magic != _MAGIC_NUMBER:
        raise ValueError("not a torch legacy checkpoint (bad magic)")
    protocol = _meta_load(fh)
    if protocol != _PROTOCOL_VERSION:
        raise ValueError(f"unsupported torch legacy protocol {protocol}")
    _meta_load(fh)  # sys_info (int sizes), unused

    storages: Dict[str, np.ndarray] = {}
    pending: Dict[str, Tuple[_StorageType, int]] = {}

    def storage_loader(key: str, stype: _StorageType, numel: int) -> np.ndarray:
        # legacy data comes AFTER the object pickle; hand out a lazily
        # filled view holder. Tensors are rebuilt from these buffers only
        # after _read_payloads runs, so record and return a placeholder
        # that we fill in place.
        pending[key] = (stype, numel)
        storages.setdefault(
            key, np.zeros(numel, dtype=stype.dtype)
        )
        return storages[key]

    result = _TorchUnpickler(fh, storage_loader).load()

    keys = _meta_load(fh)  # deserialized storage keys, in write order
    for key in keys:
        key = str(key)
        stype, numel = pending[key]
        (count,) = struct.unpack("<q", fh.read(8))
        raw = fh.read(count * stype.dtype.itemsize)
        storages[key][:] = np.frombuffer(raw, dtype=stype.dtype, count=count)[
            :numel
        ]
    return result


def load_torch_pickle(path: str) -> Any:
    """Load a ``torch.save`` file without torch.

    Returns the saved object with tensors as NumPy arrays (the reference's
    checkpoints are ``{'net': state_dict, ...}`` dicts,
    trainchaos_proposed_30cases1labeled.py:505-511).
    """
    with open(path, "rb") as fh:
        if zipfile.is_zipfile(fh):
            fh.seek(0)
            return _finalize(_load_zip(fh))
        fh.seek(0)
        return _finalize(_load_legacy(fh))
