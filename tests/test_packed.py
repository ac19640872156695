"""PackedFuseUNet (lane-dense space-to-depth execution) IS FuseUNet.

The packed model (models/packed.py) must be numerically the plain model:
identical variable tree and initialization, identical outputs, identical
BatchNorm statistic updates, identical gradients — only the execution
layout differs. Any placement-map or boundary-mask bug breaks these pins.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aide_tpu.core.config import ModelConfig
from aide_tpu.models import build_model
from aide_tpu.models.fuseunet import FuseUNet
from aide_tpu.models.packed import PackedFuseUNet, pack, unpack


def _models(norm="batch", w=8):
    kw = dict(
        num_classes=2, base_width=w, norm=norm, group_norm_groups=4,
        compute_dtype="float32",
    )
    return FuseUNet(variant="plain", **kw), PackedFuseUNet(**kw)


def _tree_shapes(t):
    return jax.tree_util.tree_map(lambda x: (x.shape, str(x.dtype)), t)


@pytest.mark.parametrize("norm", ["batch", "group"])
def test_same_variables_and_init(norm):
    plain, packed = _models(norm)
    x = jnp.zeros((1, 32, 32, 3))
    v_plain = plain.init(jax.random.key(7), x, x, train=False)
    v_packed = packed.init(jax.random.key(7), x, x, train=False)
    assert _tree_shapes(v_plain) == _tree_shapes(v_packed)
    # same seed => same values (paths drive flax param RNG folding)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=0),
        v_plain, v_packed,
    )


@pytest.mark.parametrize("norm", ["batch", "group"])
def test_forward_eval_matches(norm, rng):
    plain, packed = _models(norm)
    x = jnp.zeros((1, 32, 32, 3))
    v = plain.init(jax.random.key(0), x, x, train=False)
    m1 = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    m2 = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    out_p = plain.apply(v, m1, m2, train=False)
    out_k = packed.apply(v, m1, m2, train=False)
    np.testing.assert_allclose(out_p, out_k, rtol=1e-4, atol=1e-4)


def test_forward_train_matches_with_stats(rng):
    plain, packed = _models("batch")
    x = jnp.zeros((1, 32, 32, 3))
    v = plain.init(jax.random.key(1), x, x, train=False)
    m1 = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    m2 = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    out_p, upd_p = plain.apply(v, m1, m2, train=True, mutable=["batch_stats"])
    out_k, upd_k = packed.apply(v, m1, m2, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(out_p, out_k, rtol=1e-4, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
        upd_p["batch_stats"], upd_k["batch_stats"],
    )


def test_gradients_match(rng):
    plain, packed = _models("batch")
    x = jnp.zeros((1, 32, 32, 3))
    v = plain.init(jax.random.key(2), x, x, train=False)
    m1 = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    m2 = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(2, 32, 32, 2)), jnp.float32)

    def loss(model):
        def f(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                m1, m2, train=True, mutable=["batch_stats"],
            )
            return jnp.mean((out - t) ** 2)
        return jax.grad(f)(v["params"])

    g_p, g_k = loss(plain), loss(packed)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5),
        g_p, g_k,
    )


def test_pack_unpack_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 5)), jnp.float32)
    np.testing.assert_array_equal(unpack(pack(x, 2, 2), 2, 2), x)


def test_registry_builds_packed():
    cfg = ModelConfig(name="fuseunet", packed=True, compute_dtype="float32")
    model = build_model(cfg)
    assert isinstance(model, PackedFuseUNet)
    cfg2 = ModelConfig(name="fuseunetsa", packed=True, compute_dtype="float32")
    assert not isinstance(build_model(cfg2), PackedFuseUNet)


@pytest.mark.slow
def test_checkpoint_interchange(tmp_path, rng):
    """Params trained/saved by one layout load into the other bit-for-bit."""
    plain, packed = _models("batch", w=8)
    x = jnp.zeros((1, 32, 32, 3))
    v = packed.init(jax.random.key(3), x, x, train=False)
    m1 = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    out_k = packed.apply(v, m1, m1, train=False)
    out_p = plain.apply(v, m1, m1, train=False)
    np.testing.assert_allclose(out_p, out_k, rtol=1e-4, atol=1e-4)


def test_packed_remat_matches(rng):
    """remat-wrapped packed blocks are the same function (checkpointing
    must not change values or the variable tree)."""
    kw = dict(
        num_classes=2, base_width=8, norm="batch", group_norm_groups=4,
        compute_dtype="float32",
    )
    a = PackedFuseUNet(**kw)
    b = PackedFuseUNet(remat=True, **kw)
    x = jnp.zeros((1, 32, 32, 3))
    v = a.init(jax.random.key(4), x, x, train=False)
    m = jnp.asarray(np.random.default_rng(1).normal(size=(2, 32, 32, 3)), jnp.float32)
    out_a = a.apply(v, m, m, train=False)
    out_b = b.apply(v, m, m, train=False)
    np.testing.assert_allclose(out_a, out_b, rtol=1e-5, atol=1e-6)


def test_packed_under_net_vmap(rng):
    """The dual-net stacked-params vmap (engine/steps.py) over the packed
    model equals per-net application."""
    plain, packed = _models("batch")
    x = jnp.zeros((1, 32, 32, 3))
    v1 = packed.init(jax.random.key(5), x, x, train=False)
    v2 = packed.init(jax.random.key(6), x, x, train=False)
    stacked = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), v1, v2)
    m = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)

    def fwd(v):
        return packed.apply(v, m, m, train=False)

    outs = jax.vmap(fwd)(stacked)
    np.testing.assert_allclose(outs[0], fwd(v1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs[1], fwd(v2), rtol=1e-5, atol=1e-6)
