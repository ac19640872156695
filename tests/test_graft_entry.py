"""Driver entry points: single-chip forward and 8-device mesh dry run."""

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
