"""Connected-component post-processing (host side).

Re-implements keep_largest_connected_components
(/root/reference/train_files/trainchaos_proposed_30cases1labeled.py:103-112),
which the reference builds on skimage.measure.label(connectivity=1). Here it
uses scipy.ndimage.label with the default face-connectivity structure (the
same 4-neighbourhood in 2D / 6-neighbourhood in 3D) and np.bincount for the
area argmax — O(N) instead of a Python loop over regionprops.

This runs on host between epochs / after case inference; the mask volumes are
tiny (S x H x W uint8) relative to the training compute.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def keep_largest_connected_components(mask: np.ndarray) -> np.ndarray:
    """Zero out all but the largest foreground component (2D or 3D).

    Uses the native C++ union-find (aide_tpu/native) when available and
    falls back to scipy.ndimage — both use the same face connectivity.
    """
    mask = np.asarray(mask)
    if mask.max() <= 0:
        return np.zeros(mask.shape, dtype=np.uint8)

    if mask.ndim in (2, 3):
        from aide_tpu import native

        out = native.keep_largest_cc(mask)
        if out is not None:
            return out

    out = np.zeros(mask.shape, dtype=np.uint8)
    labels, num = ndimage.label(mask > 0)
    if num == 0:
        return out
    sizes = np.bincount(labels.ravel())
    sizes[0] = 0  # background
    out[labels == np.argmax(sizes)] = 1
    return out
