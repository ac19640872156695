"""Model shape / variant / registry tests (tiny widths for the 1-CPU host)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aide_tpu.core.config import ModelConfig
from aide_tpu.models import UNet, FuseUNet, build_model, is_two_modal, MODELS


def _init_apply(model, *inputs):
    variables = model.init(jax.random.key(0), *inputs, train=False)
    out, updates = model.apply(
        variables, *inputs, train=True, mutable=["batch_stats"]
    )
    return variables, out, updates


class TestUNet:
    @pytest.mark.slow
    def test_shapes_and_dtype(self):
        model = UNet(num_classes=2, base_width=4, compute_dtype="float32")
        x = jnp.zeros((2, 32, 32, 3))
        variables, out, _ = _init_apply(model, x)
        assert out.shape == (2, 32, 32, 2)
        assert out.dtype == jnp.float32
        assert "batch_stats" in variables

    def test_width_scaling_param_count(self):
        """Doubling base_width ~4x the parameters (conv-dominated)."""

        def count(width):
            m = UNet(num_classes=2, base_width=width, compute_dtype="float32")
            v = m.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)), train=False)
            return sum(x.size for x in jax.tree_util.tree_leaves(v["params"]))

        c2, c4 = count(2), count(4)
        assert 3.0 < c4 / c2 < 4.5

    @pytest.mark.slow
    def test_spatial_attention_variant(self):
        model = UNet(
            num_classes=2, base_width=16, spatial_attention=True,
            compute_dtype="float32",
        )
        x = jnp.zeros((1, 32, 32, 3))
        _, out, _ = _init_apply(model, x)
        assert out.shape == (1, 32, 32, 2)

    def test_group_norm_no_batch_stats(self):
        model = UNet(num_classes=2, base_width=4, norm="group", compute_dtype="float32")
        v = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)), train=False)
        assert "batch_stats" not in v

    @pytest.mark.slow
    def test_bfloat16_compute_fp32_params(self):
        model = UNet(num_classes=2, base_width=4, compute_dtype="bfloat16")
        x = jnp.zeros((1, 16, 16, 3))
        v = model.init(jax.random.key(0), x, train=False)
        leaves = jax.tree_util.tree_leaves(v["params"])
        assert all(l.dtype == jnp.float32 for l in leaves)
        out = model.apply(v, x, train=False)
        assert out.dtype == jnp.float32  # head casts logits back

    @pytest.mark.slow
    def test_learned_bilinear(self):
        model = UNet(
            num_classes=2, base_width=4, learned_bilinear=True,
            compute_dtype="float32",
        )
        _, out, _ = _init_apply(model, jnp.zeros((1, 16, 16, 3)))
        assert out.shape == (1, 16, 16, 2)


class TestFuseUNet:
    @pytest.mark.parametrize("variant", ["plain", "sa", "sa_separate"])
    def test_variants(self, variant):
        model = FuseUNet(
            num_classes=2, base_width=4, variant=variant, compute_dtype="float32"
        )
        a = jnp.zeros((1, 32, 32, 3))
        b = jnp.zeros((1, 32, 32, 3))
        _, out, _ = _init_apply(model, a, b)
        assert out.shape == (1, 32, 32, 2)

    @pytest.mark.slow
    def test_modal1_encoder_sees_fused_channels(self):
        """'plain' modal-1 level-2 block input is 2*w channels (fused);
        'sa_separate' keeps it at w (fuseunet.py:14 vs :219)."""
        def kernel_in(variant):
            m = FuseUNet(num_classes=2, base_width=4, variant=variant, compute_dtype="float32")
            v = m.init(
                jax.random.key(0),
                jnp.zeros((1, 16, 16, 3)),
                jnp.zeros((1, 16, 16, 3)),
                train=False,
            )
            return v["params"]["modal1_block2"]["Conv_0"]["kernel"].shape[2]

        assert kernel_in("plain") == 8      # fused 2*w
        assert kernel_in("sa_separate") == 4  # separate w

    def test_bad_variant_raises(self):
        model = FuseUNet(variant="nope", compute_dtype="float32")
        with pytest.raises(ValueError, match="variant"):
            model.init(
                jax.random.key(0),
                jnp.zeros((1, 16, 16, 3)),
                jnp.zeros((1, 16, 16, 3)),
                train=False,
            )


class TestRegistry:
    def test_all_reference_models_registered(self):
        expected = {
            "unet", "unetsa", "unet2", "unet4", "unet8", "unet16",
            "unet32", "unet128", "fuseunet", "fuseunetsa",
            "fuseunetsaseparate",
        }
        assert expected <= set(MODELS.names())

    def test_build_from_config(self):
        cfg = ModelConfig(name="unet8", num_classes=5, compute_dtype="float32")
        model = build_model(cfg)
        assert isinstance(model, UNet)
        assert model.base_width == 8
        assert model.num_classes == 5

    def test_two_modal_detection(self):
        assert is_two_modal("fuseunetsa")
        assert not is_two_modal("unet32")


class TestCAUpBlocks:
    @pytest.mark.parametrize("residual", [False, True])
    def test_ca_up_block(self, residual):
        from aide_tpu.models.blocks import CAUpBlock

        blk = CAUpBlock(
            skip_features=4, features=4, residual=residual,
            norm="group", dtype=jnp.float32,
        )
        skip = jnp.zeros((1, 16, 16, 4))
        x = jnp.ones((1, 8, 8, 8))
        v = blk.init(jax.random.key(0), skip, x, train=False)
        out = blk.apply(v, skip, x, train=False)
        assert out.shape == (1, 16, 16, 4)


@pytest.mark.slow
class TestRemat:
    def test_remat_matches_no_remat(self):
        x = jnp.ones((1, 16, 16, 3)) * 0.3
        a = UNet(num_classes=2, base_width=4, compute_dtype="float32", remat=False)
        b = UNet(num_classes=2, base_width=4, compute_dtype="float32", remat=True)
        va = a.init(jax.random.key(0), x, train=False)
        vb = b.init(jax.random.key(0), x, train=False)
        # same parameter structure and values (remat is a lifted transform)
        la = jax.tree_util.tree_leaves(va["params"])
        lb = jax.tree_util.tree_leaves(vb["params"])
        assert all(np.array_equal(p, q) for p, q in zip(la, lb))
        oa = a.apply(va, x, train=False)
        ob = b.apply(vb, x, train=False)
        assert np.allclose(np.asarray(oa), np.asarray(ob), atol=1e-6)

    def test_remat_grads_match(self):
        x = jnp.ones((2, 16, 16, 3)) * 0.5
        t = jnp.zeros((2, 16, 16), jnp.int32)
        from aide_tpu.ops import losses

        def make_loss(model, v):
            def loss(p):
                out, _ = model.apply(
                    {"params": p, "batch_stats": v["batch_stats"]},
                    x, train=True, mutable=["batch_stats"],
                )
                return losses.cem_dice_loss(out, t)
            return loss

        a = UNet(num_classes=2, base_width=2, compute_dtype="float32", remat=False)
        b = UNet(num_classes=2, base_width=2, compute_dtype="float32", remat=True)
        va = a.init(jax.random.key(1), x, train=False)
        vb = b.init(jax.random.key(1), x, train=False)
        ga = jax.grad(make_loss(a, va))(va["params"])
        gb = jax.grad(make_loss(b, vb))(vb["params"])
        la = jax.tree_util.tree_leaves(ga)
        lb = jax.tree_util.tree_leaves(gb)
        assert all(np.allclose(p, q, atol=1e-5) for p, q in zip(la, lb))


class TestUpsample2x:
    def test_matches_jax_image_resize(self, rng):
        import jax
        import jax.numpy as jnp

        from aide_tpu.models.blocks import upsample2x_bilinear

        for shape in [(2, 8, 8, 3), (1, 16, 5, 7), (3, 1, 4, 2)]:
            x = jnp.asarray(rng.normal(size=shape), jnp.float32)
            ref = jax.image.resize(
                x, (shape[0], 2 * shape[1], 2 * shape[2], shape[3]), "bilinear"
            )
            got = upsample2x_bilinear(x)
            assert float(jnp.abs(ref - got).max()) < 1e-5
