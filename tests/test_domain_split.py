"""Cross-domain appearance split of the synthetic generator.

The reference's second imperfection regime is cross-domain transfer: a
fully-labeled SOURCE scanner domain plus an unlabeled TARGET domain of the
same anatomy (prostate ISBI-3T <-> ISBI-DX,
/root/reference/train_files/trainprostate_proposed_isbi3ttransferisbidx.py,
CSVs under Prostate_split2D_crossdomain/). `SyntheticTask(domain_split=
"src:tgt")` is the synthetic analogue: cases below the clean budget render
with the source domain's appearance distribution, all other train cases and
the held-out test split with the target's, while the SHAPE draws stay
domain-invariant (a scanner change, not a patient change).
"""

import numpy as np
import pytest

from aide_tpu.data.tasks.synthetic import SyntheticTask


def _make(tmp_path, domain_split, **kw):
    opts = dict(
        root=str(tmp_path / f"d_{domain_split or 'none'}"),
        style="xhard",
        num_cases=4,
        clean_cases=2,
        slices_per_case=2,
        size=48,
        seed=11,
        domain_split=domain_split,
        test_case_offset=100,   # held-out anatomy => target domain
        num_test_cases=2,
    )
    opts.update(kw)
    return SyntheticTask(**opts)


def test_anatomy_is_domain_invariant(tmp_path):
    """Masks must be identical across domain assignments — the split only
    changes appearance (contrast/noise/bias/distractor rendering)."""
    t_ab = _make(tmp_path, "a:b")
    t_ba = _make(tmp_path, "b:a")
    t_none = _make(tmp_path, "")
    for train in (True, False):
        for s1, s2, s3 in zip(
            t_ab.load_manifest(train=train),
            t_ba.load_manifest(train=train),
            t_none.load_manifest(train=train),
        ):
            (i1,), m1 = t_ab.decode(s1)
            (i2,), m2 = t_ba.decode(s2)
            (i3,), m3 = t_none.decode(s3)
            assert np.array_equal(m1, m2)
            assert np.array_equal(m1, m3)
            # appearance genuinely differs between assignments
            assert not np.array_equal(i1, i2)


def test_split_assignment_rule(tmp_path):
    """Clean-budget cases render the source domain, the rest (and the test
    split) the target: swapping the direction flips exactly the pixels."""
    t_ab = _make(tmp_path, "a:b")
    # a case rendered as domain 'a' in a:b equals the same case rendered as
    # domain 'a' in a:a (i.e. the domain, not the direction string, decides)
    t_aa = _make(tmp_path, "a:a")
    specs_ab = t_ab.load_manifest(train=True)
    specs_aa = t_aa.load_manifest(train=True)
    for sab, saa in zip(specs_ab, specs_aa):
        (iab,), _ = t_ab.decode(sab)
        (iaa,), _ = t_aa.decode(saa)
        if sab.extras["case"] < 2:      # clean budget: source domain 'a'
            assert np.array_equal(iab, iaa)
        else:                           # target domain 'b' != 'a'
            assert not np.array_equal(iab, iaa)
    # held-out test cases render the TARGET domain
    tst_ab = t_ab.load_manifest(train=False)
    tst_bb = _make(tmp_path, "b:b").load_manifest(train=False)
    (x1,), _ = t_ab.decode(tst_ab[0])
    (x2,), _ = _make(tmp_path, "b:b").decode(tst_bb[0])
    assert np.array_equal(x1, x2)


def test_fingerprint_and_validation(tmp_path):
    assert (
        _make(tmp_path, "a:b").decode_fingerprint()
        != _make(tmp_path, "").decode_fingerprint()
    )
    with pytest.raises(ValueError, match="domain_split"):
        _make(tmp_path, "a:z")
    with pytest.raises(ValueError, match="hard/xhard"):
        _make(tmp_path, "a:b", style="ellipse")


def test_modal2_shifts_with_domain(tmp_path):
    """The domain is a SCANNER: with two_modal=True BOTH acquisitions must
    shift with the domain assignment. (Regression for the round-4 review
    finding: modal2 originally ignored _domain_of, so a fused model could
    segment the 'shifted' target through the unshifted second modality,
    silently collapsing the transfer protocol's domain gap.)"""
    t_aa = _make(tmp_path, "a:a", two_modal=True)
    t_bb = _make(tmp_path, "b:b", two_modal=True)
    s_a = t_aa.load_manifest(train=True)[0]
    s_b = t_bb.load_manifest(train=True)[0]
    (a1, a2), ma = t_aa.decode(s_a)
    (b1, b2), mb = t_bb.decode(s_b)
    assert np.array_equal(ma, mb)            # same anatomy
    assert not np.array_equal(a1, b1)        # modal1 shifts
    assert not np.array_equal(a2, b2)        # modal2 shifts too
    # same domain => modal2 render is deterministic
    t_aa2 = _make(tmp_path, "a:a", two_modal=True, root=str(tmp_path / "re"))
    (c1, c2), _ = t_aa2.decode(t_aa2.load_manifest(train=True)[0])
    assert np.array_equal(a2, c2)
    # modal2 keeps its conventions under a domain: fg darker than its bg
    fg = a2[ma.astype(bool)].mean()
    bg = a2[~ma.astype(bool)].mean()
    assert fg < bg


def test_domains_differ_in_cnr(tmp_path):
    """Domain b is the low-contrast-to-noise / heavy-bias look; the gap must
    be systematic (per-image normalization removes base shifts, so CNR is
    what the transfer ladder's difficulty rests on)."""
    cnrs = {}
    for dom in ("a", "b"):
        t = _make(tmp_path, f"{dom}:{dom}", num_cases=8, clean_cases=8)
        vals = []
        for spec in t.load_manifest(train=True):
            (img,), _ = t.decode(spec)
            g = img[..., 0]
            mask = t.clean_mask(spec).astype(bool)
            if mask.sum() < 8 or (~mask).sum() < 8:
                continue
            fg, bg = g[mask], g[~mask]
            vals.append(abs(fg.mean() - bg.mean()) / (bg.std() + 1e-6))
        cnrs[dom] = float(np.mean(vals))
    assert cnrs["a"] > cnrs["b"] * 1.2, cnrs
