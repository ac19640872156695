"""Grayscale / palette PNG mask IO (PIL-backed).

Masks in the reference are 8-bit grayscale PNGs with class labels encoded as
intensity steps of 63 (palette [[0],[63],[126],[189],[252]],
/root/reference/datasetchaos_proposed/dataset.py:9) and refreshed working
labels written as ``foreground * 63``
(/root/reference/train_files/trainchaos_proposed_30cases1labeled.py:549-551).
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def read_mask(path: str) -> np.ndarray:
    """Read a mask PNG as (H, W) uint8 intensity values."""
    img = Image.open(path)
    if img.mode != "L":
        img = img.convert("L")
    return np.asarray(img, dtype=np.uint8)


def write_mask(path: str, mask: np.ndarray, scale: int = 63) -> None:
    """Write a binary/class-index mask as intensity * scale.

    compress_level=1: label refreshes rewrite hundreds of tempmask PNGs per
    epoch on a 1-core host; zlib level 1 is ~4x faster to encode than PIL's
    default 6 and these near-constant masks still shrink ~100x."""
    arr = (np.asarray(mask) * scale).astype(np.uint8)
    Image.fromarray(arr, mode="L").save(path, compress_level=1)


def read_image_rgb(path: str) -> np.ndarray:
    img = Image.open(path)
    if img.mode != "RGB":
        img = img.convert("RGB")
    return np.asarray(img, dtype=np.uint8)
