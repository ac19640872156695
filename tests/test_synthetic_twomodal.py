"""The complementary second modality of the synthetic hard/xhard styles.

The reference's flagship CHAOS setup is two-modal (T1 in-phase/out-phase,
dataset_chaos/: two channels of one acquisition with different tissue
contrast) feeding FuseUNet. The synthetic task mirrors that: modality 2
renders the SAME geometry with an independent case-keyed appearance
(inverted foreground contrast, its own distractor gain/noise/bias), so a
fused model genuinely gains information — unlike the historical
ellipse-style second channel, which is just 255 - modal1.
"""

import numpy as np
import pytest

from aide_tpu.data.tasks.synthetic import SyntheticTask


def _make(style, two_modal, tmp_path, **kw):
    return SyntheticTask(
        root=str(tmp_path / f"s_{style}_{two_modal}"),
        style=style,
        two_modal=two_modal,
        num_cases=2,
        slices_per_case=2,
        size=48,
        seed=11,
        **kw,
    )


@pytest.mark.parametrize("style", ["hard", "xhard"])
def test_modal1_unchanged_by_two_modal(style, tmp_path):
    """Enabling the second modality must not perturb modality 1 or the
    labels (the generator draws modality-2 params from separate streams)."""
    t1 = _make(style, False, tmp_path)
    t2 = _make(style, True, tmp_path)
    for sp1, sp2 in zip(t1.load_manifest(train=True), t2.load_manifest(train=True)):
        (a1,), l1 = t1.decode(sp1)
        (b1, b2), l2 = t2.decode(sp2)
        assert np.array_equal(a1, b1)
        assert np.array_equal(l1, l2)
        assert b2.shape == b1.shape


def test_modal2_complementary_not_inverse(tmp_path):
    t = _make("xhard", True, tmp_path)
    spec = t.load_manifest(train=True)[0]
    (m1, m2), _ = t.decode(spec)
    # not the trivial inverse of modality 1
    assert not np.array_equal(m2[..., 0], 255.0 - m1[..., 0])
    # deterministic
    (r1, r2), _ = t.decode(spec)
    assert np.array_equal(m1, r1) and np.array_equal(m2, r2)
    # inverted foreground contrast: fg darker than bg in modality 2
    fg = t.clean_mask(spec).astype(bool)
    assert m2[..., 0][fg].mean() < m2[..., 0][~fg].mean()
    assert m1[..., 0][fg].mean() > m1[..., 0][~fg].mean()


def test_modal2_noise_independent(tmp_path):
    """Slices of one case share modality-2 appearance (case-keyed) but have
    independent per-slice noise."""
    t = _make("xhard", True, tmp_path)
    specs = t.load_manifest(train=True)
    same_case = [s for s in specs if s.case_id == specs[0].case_id]
    (_, a2), _ = t.decode(same_case[0])
    (_, b2), _ = t.decode(same_case[1])
    assert not np.array_equal(a2, b2)


def test_ellipse_style_keeps_inverse_channel(tmp_path):
    t = _make("ellipse", True, tmp_path)
    spec = t.load_manifest(train=True)[0]
    (m1, m2), _ = t.decode(spec)
    # both channels truncate to uint8 independently, so allow 1 LSB
    assert np.abs(m2[..., 0] - (255.0 - m1[..., 0])).max() <= 1.0
