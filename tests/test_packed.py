"""PackedFuseUNet (lane-dense space-to-depth execution) IS FuseUNet.

The packed model (models/packed.py) must be numerically the plain model:
identical variable tree and initialization, identical outputs, identical
BatchNorm statistic updates, identical gradients — only the execution
layout differs. Any placement-map or boundary-mask bug breaks these pins.
"""

import dataclasses

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


def test_block_barrier_is_identity(rng):
    """ModelConfig.packed_block_barrier (the XLA backward-fusion NaN
    workaround, models/packed.py BLOCK_BARRIER comment) is semantically the
    identity: bitwise-equal forward outputs and gradients, same variable
    tree. On the chip it changes only fusion scope (probe:
    experiments/naive_nan_probe4.py — barrier cured all 8 non-finite
    gradient leaves at a bit-identical loss)."""
    kw = dict(
        num_classes=2, base_width=8, norm="batch", group_norm_groups=4,
        compute_dtype="float32",
    )
    a = PackedFuseUNet(**kw)
    b = PackedFuseUNet(block_barrier=True, **kw)
    x = jnp.zeros((1, 32, 32, 3))
    v = a.init(jax.random.key(5), x, x, train=False)
    assert _tree_shapes(v) == _tree_shapes(
        b.init(jax.random.key(5), x, x, train=False)
    )
    m1 = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    m2 = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(2, 32, 32, 2)), jnp.float32)
    np.testing.assert_array_equal(
        a.apply(v, m1, m2, train=False), b.apply(v, m1, m2, train=False)
    )

    def grads(model):
        def f(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                m1, m2, train=True, mutable=["batch_stats"],
            )
            return jnp.mean((out - t) ** 2)
        return jax.grad(f)(v["params"])

    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_array_equal(p, q),
        grads(a), grads(b),
    )
    # and the config knob reaches the registry-built model
    cfg = ModelConfig(
        name="fuseunet", packed=True, compute_dtype="float32",
        packed_block_barrier=True,
    )
    assert build_model(cfg).block_barrier is True
    # ...but forward-only programs get the barrier-free twin: the barrier
    # guards a backward-fusion miscompile, and eval/predict never
    # differentiate — paying its fusion cost there inflated the epoch tail
    # (experiments/bench_r5_repeats.jsonl, 29.5 s vs 23.15 s)
    from aide_tpu.models import build_eval_model

    assert build_eval_model(cfg).block_barrier is False


def test_barrier_scope(rng):
    """packed_block_barrier_scope bounds WHICH blocks get the fence.

    The probe5 bisect (experiments/naive_nan_probe5.py, q5/10): fencing
    modal2_block1 alone cures all 8 non-finite gradient leaves of the
    chip miscompile; fencing up_block4 alone cures none. So "encoder"
    (default) fences the two block-1 stages only, "all" also fences
    up_block4's conv block. Pin the traced barrier counts, the identity
    semantics across scopes, and the unknown-scope rejection."""
    kw = dict(
        num_classes=2, base_width=8, norm="batch", group_norm_groups=4,
        compute_dtype="float32",
    )
    x = jnp.zeros((1, 32, 32, 3))

    def n_barriers(model, nargs):
        v = model.init(jax.random.key(5), *([x] * nargs), train=False)
        jaxpr = jax.make_jaxpr(
            lambda *a: model.apply(v, *a, train=False)
        )(*([x] * nargs))
        return str(jaxpr).count("optimization_barrier")

    assert n_barriers(PackedFuseUNet(block_barrier=True, **kw), 2) == 2
    assert n_barriers(
        PackedFuseUNet(block_barrier=True, barrier_scope="all", **kw), 2
    ) == 3
    assert n_barriers(PackedFuseUNet(block_barrier=False, **kw), 2) == 0
    from aide_tpu.models.packed import PackedUNet

    assert n_barriers(PackedUNet(block_barrier=True, **kw), 1) == 1
    assert n_barriers(
        PackedUNet(block_barrier=True, barrier_scope="all", **kw), 1
    ) == 2

    # scope never changes values (the fence is the identity)
    m1 = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    m2 = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    enc = PackedFuseUNet(block_barrier=True, **kw)
    al = PackedFuseUNet(block_barrier=True, barrier_scope="all", **kw)
    v = enc.init(jax.random.key(5), x, x, train=False)
    np.testing.assert_array_equal(
        enc.apply(v, m1, m2, train=False), al.apply(v, m1, m2, train=False)
    )

    with pytest.raises(ValueError, match="packed_block_barrier_scope"):
        PackedFuseUNet(
            block_barrier=True, barrier_scope="bogus", **kw
        ).init(jax.random.key(5), x, x, train=False)

    # the config knob reaches the registry-built models
    cfg = ModelConfig(
        name="fuseunet", packed=True, compute_dtype="float32",
        packed_block_barrier=True, packed_block_barrier_scope="all",
    )
    assert build_model(cfg).barrier_scope == "all"
    assert build_model(
        dataclasses.replace(cfg, packed_block_barrier_scope="encoder")
    ).barrier_scope == "encoder"


def test_trainer_eval_model_drops_barrier(tmp_path):
    """Trainer scopes the packed block barrier to the train step: the
    eval/predict model twin must have it off while the train model keeps
    the configured value (same params — test_block_barrier_is_identity
    pins that the twin is numerically the identical network)."""
    from aide_tpu.core.config import TrainConfig
    from aide_tpu.data.tasks.synthetic import SyntheticTask
    from aide_tpu.engine.trainer import Trainer

    cfg = TrainConfig()
    cfg.model = ModelConfig(
        name="unet4", compute_dtype="float32", packed=True,
        packed_block_barrier=True,
    )
    cfg.data.task = "synthetic"
    cfg.data.variant = "proposed"
    cfg.data.img_size = 32
    cfg.data.batch_size = 4
    cfg.data.eval_batch_size = 4
    cfg.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.history_dir = str(tmp_path / "hist")
    task = SyntheticTask(
        root=str(tmp_path / "synth"), tempmask_folder="tempmasks",
        num_cases=4, slices_per_case=4, size=32, seed=3,
    )
    t = Trainer(cfg, task=task)
    assert t.model.block_barrier is True
    assert t.eval_model.block_barrier is False


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


# ----------------------- PackedUNet (single-modal) -----------------------


def _unet_models(norm="batch", w=8):
    from aide_tpu.models.unet import UNet
    from aide_tpu.models.packed import PackedUNet

    kw = dict(
        num_classes=2, base_width=w, norm=norm, group_norm_groups=4,
        compute_dtype="float32",
    )
    return UNet(**kw), PackedUNet(**kw)


@pytest.mark.parametrize("norm", ["batch", "group"])
def test_unet_same_variables_and_forward(norm, rng):
    plain, packed = _unet_models(norm)
    x = jnp.zeros((1, 32, 32, 3))
    v_plain = plain.init(jax.random.key(9), x, train=False)
    v_packed = packed.init(jax.random.key(9), x, train=False)
    assert _tree_shapes(v_plain) == _tree_shapes(v_packed)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=0),
        v_plain, v_packed,
    )
    m = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    out_p = plain.apply(v_plain, m, train=False)
    out_k = packed.apply(v_plain, m, train=False)
    np.testing.assert_allclose(out_p, out_k, rtol=1e-4, atol=1e-4)


def test_unet_train_stats_and_grads(rng):
    plain, packed = _unet_models("batch")
    x = jnp.zeros((1, 32, 32, 3))
    v = plain.init(jax.random.key(10), x, train=False)
    m = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(2, 32, 32, 2)), jnp.float32)
    out_p, upd_p = plain.apply(v, m, train=True, mutable=["batch_stats"])
    out_k, upd_k = packed.apply(v, m, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(out_p, out_k, rtol=1e-4, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
        upd_p["batch_stats"], upd_k["batch_stats"],
    )

    def grad(model):
        def f(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                m, train=True, mutable=["batch_stats"],
            )
            return jnp.mean((out - t) ** 2)
        return jax.grad(f)(v["params"])

    # float32 reassociation noise amplifies through the 9-layer BN backward
    # (measured ~1.6% on the first kernel); the f64 subprocess test below
    # pins exactness at 1e-12, this is only a smoke check
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-2, atol=1e-2),
        grad(plain), grad(packed),
    )


@pytest.mark.slow
def test_models_exact_in_float64():
    """THE exactness pin: under float64 end to end, packed forward is
    bit-identical to plain and gradients agree to 1e-12 — any
    placement-map, boundary-mask, or statistics bug breaks this loudly
    (float32 tolerances can hide small semantic errors). x64 must be set
    before jax initializes, hence a subprocess."""
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from aide_tpu.models import blocks
blocks.resolve_dtype = lambda name: jnp.float64
from aide_tpu.models.unet import UNet
from aide_tpu.models.fuseunet import FuseUNet
from aide_tpu.models.packed import PackedUNet, PackedFuseUNet

rng = np.random.default_rng(0)
kw = dict(num_classes=2, base_width=8, norm="batch", group_norm_groups=4,
          compute_dtype="float64")
x = jnp.zeros((1, 32, 32, 3))
m = jnp.asarray(rng.normal(size=(2, 32, 32, 3)))
t = jnp.asarray(rng.normal(size=(2, 32, 32, 2)))

for plain, packed, args in (
    (UNet(**kw), PackedUNet(**kw), (m,)),
    (FuseUNet(variant="plain", **kw), PackedFuseUNet(**kw), (m, m)),
):
    v = plain.init(jax.random.key(10), *((x,) * len(args)), train=False)
    v = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), v)
    op, _ = plain.apply(v, *args, train=True, mutable=["batch_stats"])
    ok, _ = packed.apply(v, *args, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(op, ok, rtol=0, atol=1e-12)

    def grad(model):
        def f(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                *args, train=True, mutable=["batch_stats"])
            return jnp.mean((out - t) ** 2)
        return jax.grad(f)(v["params"])

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-12),
        grad(plain), grad(packed))
print("f64 exactness OK")
"""
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "f64 exactness OK" in proc.stdout


def test_unet_registry_builds_packed():
    from aide_tpu.models.packed import PackedUNet

    cfg = ModelConfig(name="unet32", packed=True, compute_dtype="float32")
    assert isinstance(build_model(cfg), PackedUNet)
    cfg_sa = ModelConfig(name="unetsa", packed=True, compute_dtype="float32")
    assert not isinstance(build_model(cfg_sa), PackedUNet)


def test_fused_upsample_conv_exact(rng):
    """upsample_struct_conv (resize folded into the kernel) == resize then
    stride-2 structured conv, including the four zero-padding edge
    corrections and corner add-backs, for odd and even extents."""
    from aide_tpu.models import blocks as blocks_mod
    from aide_tpu.models import packed as packed_mod

    for n, m, cin, cout in [(8, 8, 5, 4), (7, 9, 3, 2), (4, 6, 2, 3)]:
        x = jnp.asarray(rng.normal(size=(2, n, m, cin)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
        up = blocks_mod.upsample2x_bilinear(x)
        ref = packed_mod.struct_conv(
            up, k, b, (1, 1), (2, 2), (0, 0), (0, 0), (n, m), jnp.float32
        )
        got = packed_mod.upsample_struct_conv(x, k, b, jnp.float32)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=2e-4, rtol=2e-4)
        gr = jax.grad(
            lambda kk: jnp.sum(jnp.sin(packed_mod.struct_conv(
                blocks_mod.upsample2x_bilinear(x), kk, b,
                (1, 1), (2, 2), (0, 0), (0, 0), (n, m), jnp.float32)))
        )(k)
        gg = jax.grad(
            lambda kk: jnp.sum(jnp.sin(
                packed_mod.upsample_struct_conv(x, kk, b, jnp.float32)))
        )(k)
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gg),
                                   atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("norm", ["batch", "group"])
def test_norm_stats_never_nan_on_constant_channels(norm):
    """Variance via E[x^2] - E[x]^2 cancels catastrophically on
    near-constant channels with a large mean (real MRI backgrounds): in
    float32 the difference can land BELOW -eps and rsqrt(var + eps) goes
    NaN — measured on the chip as a first-step NaN of the supervised bf16
    packed step on real CHAOS data (experiments/naive_nan_probe.py:
    bf16_packed NaN at step 1, bf16_plain / f32_packed clean). The clamp
    to >= 0 must keep output AND gradients finite for constant inputs of
    any magnitude (e.g. 57.705 over 4096 elements yields var ~ -1.5e-3
    without it)."""
    from aide_tpu.models.packed import PackedNorm

    mod = PackedNorm(kind=norm, groups=8, features=4, dtype=jnp.float32)
    mask = jnp.ones((1, 16, 16, 1, 4), jnp.float32)
    count = jnp.asarray(2 * 16 * 16 * 4, jnp.float32)

    noise = np.random.default_rng(0).normal(size=(2, 16, 16, 4, 4)) * 1e-3

    def run(const):
        # NEAR-constant (not exactly constant: XLA folds a constant input
        # reduction exactly): on CPU the unclamped formula measures var as
        # low as -0.2 for these inputs, far below -eps
        x5 = jnp.asarray(const + noise, jnp.float32)
        v = mod.init(jax.random.key(0), x5, mask, count, True)

        def loss(params):
            y = mod.apply(
                {"params": params, **{k: v[k] for k in v if k != "params"}},
                x5, mask, count, True,
                mutable=["batch_stats"] if norm == "batch" else False,
            )
            y = y[0] if isinstance(y, tuple) else y
            return jnp.sum(y * y)

        val, grads = jax.value_and_grad(loss)(v["params"])
        leaves = [val] + jax.tree_util.tree_leaves(grads)
        return all(bool(jnp.isfinite(l).all()) for l in leaves)

    for const in (54.523, 59.045, 107.3, 255.0, 1.0, 0.0):
        assert run(const), f"non-finite norm output/grads at constant {const}"
