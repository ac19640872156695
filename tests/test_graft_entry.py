"""Driver entry points: single-chip forward and 8-device mesh dry run."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

import __graft_entry__ as graft


@pytest.mark.slow
def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 256, 256, 2)
    assert out.dtype == jnp.float32


@pytest.mark.slow
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


# --------- the label-agreement gate itself must have teeth ---------


def _labels(seed=0, n=8, hw=16, fg=0.3):
    rng = np.random.default_rng(seed)
    return (rng.random((n, hw, hw)) < fg).astype(np.uint8)


def test_labels_agree_accepts_ulp_level_flips():
    """The measured-healthy round-4 divergence (53/17408 pixels, agreement
    Dice 0.9965) passes the gate."""
    one = _labels()
    mesh = one.copy()
    # flip a handful of pixels: well under 0.5% of foreground
    fg = np.argwhere(one > 0)
    for r in fg[:2]:
        mesh[tuple(r)] = 0
    assert graft._assert_labels_agree(one, mesh, net=1) > 0.995
    # identity passes at exactly 1.0
    assert graft._assert_labels_agree(one, one, net=1) == 1.0
    # both-empty counts as perfect agreement
    z = np.zeros_like(one)
    assert graft._assert_labels_agree(z, z, net=2) == 1.0


def test_labels_agree_rejects_real_divergence():
    """A perturbed placement (one case's labels replaced by noise) fails."""
    one = _labels()
    mesh = one.copy()
    mesh[0] = _labels(seed=99)[0]  # one slice genuinely diverges
    with pytest.raises(AssertionError, match="labels diverge"):
        graft._assert_labels_agree(one, mesh, net=1)


def test_labels_agree_rejects_degenerate_net():
    """An all-background placement (collapsed net refreshing empty
    predictions over real labels) scores Dice 0 and fails hard."""
    one = _labels()
    with pytest.raises(AssertionError, match="labels diverge"):
        graft._assert_labels_agree(one, np.zeros_like(one), net=2)


def test_labels_agree_rejects_shape_and_alphabet_drift():
    one = _labels()
    with pytest.raises(AssertionError):
        graft._assert_labels_agree(one, one[:, :8, :8], net=1)
    alien = one.copy()
    alien[0, 0, 0] = 7  # class id the 1-device run never produced
    with pytest.raises(AssertionError, match="classes absent"):
        graft._assert_labels_agree(one, alien, net=1)
