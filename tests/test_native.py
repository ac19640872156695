"""Native hostops (C++ union-find CC) vs scipy reference."""

import numpy as np
import pytest
from scipy import ndimage

from aide_tpu import native
from aide_tpu.ops.cc import keep_largest_connected_components


def _scipy_largest(mask):
    out = np.zeros(mask.shape, np.uint8)
    labels, num = ndimage.label(mask > 0)
    if num == 0:
        return out
    sizes = np.bincount(labels.ravel())
    sizes[0] = 0
    out[labels == np.argmax(sizes)] = 1
    return out


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


class TestNativeCC:
    @pytest.mark.parametrize("shape", [(32, 32), (6, 24, 24), (1, 16, 16)])
    def test_matches_scipy_random(self, lib, shape):
        rng = np.random.default_rng(0)
        for trial in range(5):
            mask = (rng.random(shape) > 0.6).astype(np.uint8)
            ours = native.keep_largest_cc(mask)
            ref = _scipy_largest(mask)
            assert ours.sum() == ref.sum(), trial  # same component size
            assert np.array_equal(ours, ref), trial

    def test_empty(self, lib):
        mask = np.zeros((8, 8), np.uint8)
        assert native.keep_largest_cc(mask).sum() == 0

    def test_diagonal_not_connected(self, lib):
        """Face connectivity: diagonal touching is separate (skimage
        connectivity=1 semantics, the reference's choice)."""
        mask = np.zeros((4, 4), np.uint8)
        mask[0, 0] = 1
        mask[1, 1] = 1
        mask[1, 2] = 1
        out = native.keep_largest_cc(mask)
        assert out.sum() == 2
        assert out[0, 0] == 0

    def test_volume_confusion(self, lib):
        rng = np.random.default_rng(1)
        p = (rng.random((5, 16, 16)) > 0.5).astype(np.uint8)
        t = (rng.random((5, 16, 16)) > 0.5).astype(np.uint8)
        tp, tn, fp, fn = native.volume_confusion(p, t)
        assert tp == int(((p == 1) & (t == 1)).sum())
        assert tn == int(((p == 0) & (t == 0)).sum())
        assert fp == int(((p == 1) & (t == 0)).sum())
        assert fn == int(((p == 0) & (t == 1)).sum())

    def test_wrapper_uses_native_or_fallback(self):
        mask = np.zeros((8, 8), np.uint8)
        mask[:2, :2] = 1
        mask[6, 6] = 1
        out = keep_largest_connected_components(mask)
        assert out.sum() == 4 and out[6, 6] == 0
