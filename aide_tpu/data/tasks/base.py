"""Task abstraction: manifest parsing + slice decoding + temp-label naming.

One Task class per dataset family replaces the reference's 8 near-identical
dataset packages (SURVEY §2.3). A Task knows how to:
  * parse its CSV manifest into ``SliceSpec`` rows,
  * decode one slice to raw uint8-range image(s) + a binary mask,
  * name/read/write per-net refreshed working labels ("temp masks") on disk
    using the exact convention of the corresponding reference dataset, so
    the on-disk state stays interchangeable.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image


@dataclass
class SliceSpec:
    """One training/eval slice."""

    index: int                      # position in the manifest
    case_id: str                    # grouping key for 3D eval / refresh
    sort_key: str                   # within-case ordering (filename-based)
    image_paths: Tuple[str, ...]    # 1 (single-modal) or 2 (two-modal) paths
    mask_path: str
    depth: int = 0                  # slice index into 3D volumes (-1: n/a)
    extras: Dict[str, object] = field(default_factory=dict)


def resize_image(arr: np.ndarray, size: int) -> np.ndarray:
    """Bilinear resize of an (H, W, C) uint8-range image via PIL (the
    reference resizes PIL-side before ToTensor, transform.py:36-58)."""
    img = Image.fromarray(arr.astype(np.uint8))
    img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, dtype=np.float32)


def resize_mask(mask: np.ndarray, size) -> np.ndarray:
    """Nearest-neighbour mask resize (transform.py:57-58). ``size`` is a
    square edge length or an (H, W) pair."""
    h, w = (size, size) if isinstance(size, int) else size
    img = Image.fromarray(mask.astype(np.uint8))
    img = img.resize((w, h), Image.NEAREST)
    return np.asarray(img, dtype=np.uint8)


def to_uint8_saturate(arr: np.ndarray) -> np.ndarray:
    """Clip to [0, 255] — PIL's 16-bit -> 8-bit conversion semantics, which
    the reference hits on CHAOS DICOMs (pixel_array -> convert('RGB')
    saturates every value above 255, datasetchaos_proposed/dataset.py:24-32).
    """
    return np.clip(arr, 0, 255).astype(np.uint8)


def gray_to_rgb(gray: np.ndarray) -> np.ndarray:
    return np.repeat(gray[..., None], 3, axis=-1)


class Task:
    """Base class; subclasses set ``name``/``two_modal`` and implement the
    manifest/decode/tempmask hooks."""

    name: str = ""
    two_modal: bool = False
    num_classes: int = 2
    tempmask_ext: str = "png"

    def __init__(
        self, root: str, tempmask_folder: str = "", mask_identity=None, **kw
    ):
        # mask_identity is config-level (build_task passes it to every task
        # uniformly); only KidneyTask consumes it. Anything else unknown is
        # a typo'd data.task_options entry — reject instead of silently
        # training with defaults (same contract as SyntheticTask's check).
        if kw:
            raise TypeError(
                f"{type(self).__name__}: unknown task options {sorted(kw)}"
            )
        self.root = root
        self.tempmask_folder = tempmask_folder

    # ---- manifest ----
    def load_manifest(self, csv_path: str, train: bool = True) -> List[SliceSpec]:
        raise NotImplementedError

    @staticmethod
    def load_case_list(csv_path: str) -> List[str]:
        """Case-level CSV with a ``patient_case`` column
        (inputs_chaos/All_Sets_split/splitcases/*.csv)."""
        import pandas as pd

        return [str(c) for c in pd.read_csv(csv_path)["patient_case"].tolist()]

    # ---- decoding ----
    def decode(self, spec: SliceSpec) -> Tuple[Tuple[np.ndarray, ...], np.ndarray]:
        """Returns (images, mask): images are float32 (H, W, 3) in [0, 255];
        mask is (H, W) uint8 {0, 1}."""
        raise NotImplementedError

    def decode_fingerprint(self) -> str:
        """Identifies every task-level parameter that changes ``decode()``
        output for identical specs. Folded into SlicePipeline's decode-cache
        key so a warm on-disk cache can never serve arrays decoded under
        different settings (tasks with such knobs override)."""
        return type(self).__name__

    # ---- temp-label (refreshed working label) disk mirror ----
    def tempmask_path(self, spec: SliceSpec, net: int) -> str:
        raise NotImplementedError

    def read_tempmask(self, spec: SliceSpec, net: int) -> Optional[np.ndarray]:
        """Binary (H, W) working label if a refreshed one exists on disk."""
        raise NotImplementedError

    def write_case_tempmask(
        self, specs: Sequence[SliceSpec], volume: np.ndarray, net: int
    ) -> None:
        """Mirror a refreshed (S, H, W) binary case volume to disk (native
        resolution of the specs)."""
        raise NotImplementedError

    def write_case_predictions(
        self,
        out_dir: str,
        case_id: str,
        specs: Sequence[SliceSpec],
        volume: np.ndarray,
        png_scale: int = 63,
    ) -> None:
        """Write a predicted (S, H, W) binary case volume under ``out_dir``
        in the task's NATIVE mask convention. Default: per-slice PNGs named
        after the source-image stems under <out_dir>/<case>/ (the reference
        eval layout, evalchaos_comparison_1cases.py:234-237). Tasks whose
        masks live in another format (kidney .nii.gz, prostate whole-case
        volumes) override."""
        from aide_tpu.data.io import png

        folder = os.path.join(out_dir, str(case_id))
        os.makedirs(folder, exist_ok=True)
        for spec, sl in zip(specs, volume):
            stem = os.path.basename(spec.image_paths[0]).split(".")[0]
            png.write_mask(
                os.path.join(folder, f"{stem}.png"), sl, scale=png_scale
            )

    def _ensure_dir(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
