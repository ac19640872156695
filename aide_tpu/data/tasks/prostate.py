"""Prostate ISBI task (single-modal NRRD volumes, cross-domain transfer).

Replaces datasetprostate_{comparison,proposed}
(/root/reference/datasetprostate_proposed/dataset.py): CSV manifest with
``Image,Mask,Depth`` columns addressing slices of 3D NRRD volumes, per-slice
max-normalization to [0, 255] (dataset.py:24-26), masks binarized at > 0
(:45), and per-net working labels mirrored as whole-case volumes
``<tempmask>/<maskbase>_netK.<ext>`` (:32-41).

Volumes are memoized per path — the reference re-reads and re-decodes the
full volume for every slice access on every epoch.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from aide_tpu.core.registry import TASKS
from aide_tpu.data.io import nifti, nrrd
from aide_tpu.data.tasks.base import SliceSpec, Task, gray_to_rgb, resize_mask


def read_volume(path: str) -> np.ndarray:
    """(z, y, x) volume from NRRD or NIfTI by extension."""
    if path.endswith((".nrrd", ".nhdr")):
        return nrrd.read_nrrd(path)[0]
    return nifti.read_nifti(path)


def write_volume(path: str, volume: np.ndarray) -> None:
    if path.endswith((".nrrd", ".nhdr")):
        nrrd.write_nrrd(path, volume)
    else:
        nifti.write_nifti(path, volume)


@TASKS.register("prostate")
class ProstateTask(Task):
    name = "prostate"
    two_modal = False

    def __init__(self, root: str, tempmask_folder: str = "", **kw):
        super().__init__(root, tempmask_folder, **kw)
        self._cache: Dict[str, np.ndarray] = {}

    def _volume(self, rel_path: str) -> np.ndarray:
        if rel_path not in self._cache:
            self._cache[rel_path] = read_volume(os.path.join(self.root, rel_path))
        return self._cache[rel_path]

    # ---- manifest ----
    def load_manifest(self, csv_path: str, train: bool = True) -> List[SliceSpec]:
        df = pd.read_csv(csv_path)
        specs = []
        for i, row in df.iterrows():
            img = row["Image"]
            case = os.path.basename(img).split(".")[0]
            specs.append(
                SliceSpec(
                    index=i,
                    case_id=case,
                    sort_key=f"{img}#{int(row['Depth']):04d}",
                    image_paths=(img,),
                    mask_path=row["Mask"],
                    depth=int(row["Depth"]),
                    extras={"train": train},
                )
            )
        return specs

    # ---- decode ----
    def decode(self, spec: SliceSpec) -> Tuple[Tuple[np.ndarray, ...], np.ndarray]:
        vol = self._volume(spec.image_paths[0])
        sl = vol[spec.depth].astype(np.float32)
        mx = float(sl.max()) if float(sl.max()) > 0 else 1.0
        # float -> PIL 'F' -> 'L' truncates, hence floor (dataset.py:24-28)
        u8 = np.floor(np.clip(sl / mx * 255.0, 0, 255)).astype(np.uint8)
        mask = self._volume(spec.mask_path)[spec.depth]
        binary = (mask > 0).astype(np.uint8)
        return (gray_to_rgb(u8).astype(np.float32),), binary

    # ---- temp labels (whole-case volume files) ----
    def tempmask_path_case(self, mask_rel: str, net: int) -> str:
        base = os.path.basename(mask_rel).split(".")[0]
        ext = mask_rel.split(".")[-1]
        return os.path.join(
            self.root, self.tempmask_folder, f"{base}_net{net}.{ext}"
        )

    def tempmask_path(self, spec: SliceSpec, net: int) -> str:
        return self.tempmask_path_case(spec.mask_path, net)

    def read_tempmask(self, spec: SliceSpec, net: int) -> Optional[np.ndarray]:
        path = self.tempmask_path(spec, net)
        if not os.path.exists(path):
            return None
        key = f"temp:{path}"
        if key not in self._cache:
            self._cache[key] = read_volume(path)
        return (self._cache[key][spec.depth] > 0).astype(np.uint8)

    def write_case_predictions(
        self,
        out_dir: str,
        case_id: str,
        specs: Sequence[SliceSpec],
        volume: np.ndarray,
        png_scale: int = 63,
    ) -> None:
        """Prostate-native prediction output: ONE whole-case volume file
        (the dataset's whole-case mask convention). Written as NIfTI
        <case>.nii.gz with slices at the specs' depth order; depths not in
        the manifest are zero."""
        os.makedirs(out_dir, exist_ok=True)
        depth = max(spec.depth for spec in specs) + 1
        out = np.zeros((depth,) + volume.shape[1:], np.uint8)
        for spec, sl in zip(specs, volume):
            out[spec.depth] = sl
        write_volume(os.path.join(out_dir, f"{case_id}.nii.gz"), out * 255)

    def write_case_tempmask(
        self, specs: Sequence[SliceSpec], volume: np.ndarray, net: int
    ) -> None:
        # specs address depths of one mask volume; scatter slices into a
        # full-size volume (unrefreshed depths keep the current labels).
        # Refreshed slices arrive at cfg.data.img_size; the disk mirror is
        # the only task whose convention keeps the NATIVE volume resolution,
        # so resize before scattering (LabelStore resizes back on read).
        mask_rel = specs[0].mask_path
        full = self._volume(mask_rel)
        out = (full > 0).astype(np.uint8)
        for spec, sl in zip(specs, volume):
            if sl.shape != out.shape[1:]:
                sl = resize_mask(sl, out.shape[1:])
            out[spec.depth] = sl
        path = self.tempmask_path_case(mask_rel, net)
        self._ensure_dir(path)
        write_volume(path, out)
        self._cache.pop(f"temp:{path}", None)
