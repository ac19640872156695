"""Preset construction and checkpoint round-trip tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aide_tpu.cli.presets import PRESETS, get_preset
from aide_tpu.core.config import TrainConfig, ModelConfig
from aide_tpu.engine import checkpoint as ckpt
from aide_tpu.engine.state import TrainState, DualTrainState
from aide_tpu.models import build_model
from aide_tpu.ops.schedules import make_optimizer

REFERENCE_SCRIPT_PRESETS = [
    # one preset per reference trainer script (SURVEY §2.4)
    "chaos_comparison_1case",
    "chaos_comparison_30cases1labeled",
    "chaos_proposed_30cases1labeled",
    "prostate_comparison_isbi3t_singledomain",
    "prostate_comparison_isbidx_singledomain",
    "prostate_comparison_isbi3t_transfer_isbidx",
    "prostate_comparison_isbidx_transfer_isbi3t",
    "prostate_proposed_isbi3t_transfer_isbidx",
    "prostate_proposed_isbidx_transfer_isbi3t",
    "kidney_comparison_mask1",
    "kidney_comparison_mask2",
    "kidney_comparison_mask3",
    "kidney_proposed_mask1",
    "kidney_proposed_mask2",
    "kidney_proposed_mask3",
    "breast_comparison_25cases",
    "breast_comparison_272cases25labeled",
    "breast_proposed_272cases25labeled",
]


class TestPresets:
    def test_all_reference_scripts_covered(self):
        assert set(REFERENCE_SCRIPT_PRESETS) <= set(PRESETS)

    @pytest.mark.parametrize("name", sorted(PRESETS))
    def test_builds_and_serializes(self, name):
        cfg = get_preset(name, "/data")
        assert isinstance(cfg, TrainConfig)
        # JSON round-trip preserves the config
        again = TrainConfig.from_json(cfg.to_json())
        assert again.to_dict() == cfg.to_dict()

    def test_variant_flags(self):
        assert get_preset("chaos_proposed_30cases1labeled", ".").coteach.enabled
        assert not get_preset("chaos_comparison_1case", ".").coteach.enabled
        k = get_preset("kidney_proposed_mask2", ".")
        assert k.data.mask_identity == 2
        assert k.ascending_checkpoint_gate
        assert k.coteach.sharpen_mode == "pow_inv_t"
        assert k.coteach.refresh_skip_empty

    def test_unknown_preset(self):
        with pytest.raises(KeyError, match="unknown preset"):
            get_preset("nope")


class TestCheckpointRoundtrip:
    def _make_state(self, dual=False):
        model = build_model(ModelConfig(name="unet2", compute_dtype="float32"))
        x = jnp.zeros((1, 16, 16, 3))
        tx = make_optimizer(TrainConfig().optim, 4, 4)
        v1 = model.init(jax.random.key(0), x, train=False)
        if dual:
            v2 = model.init(jax.random.key(1), x, train=False)
            return DualTrainState.create(v1, v2, tx)
        return TrainState.create(v1, tx)

    def test_full_state_roundtrip(self, tmp_path):
        state = self._make_state(dual=True)
        # mutate so the restored state is distinguishable from fresh init
        state = state.replace(step=state.step + 5)
        p = str(tmp_path / "full.msgpack")
        ckpt.save_train_state(p, state, {"epoch": 5})
        fresh = self._make_state(dual=True)
        restored = ckpt.load_train_state(p, fresh)
        assert int(restored.step) == 5
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        assert all(np.array_equal(x, y) for x, y in zip(a, b))
        oa = jax.tree_util.tree_leaves(state.opt_state)
        ob = jax.tree_util.tree_leaves(restored.opt_state)
        assert all(np.array_equal(x, y) for x, y in zip(oa, ob))
        assert ckpt.read_meta(p)["epoch"] == 5

    @pytest.mark.slow
    def test_net_export_and_warm_start(self, tmp_path):
        single = self._make_state(dual=False)
        p = str(tmp_path / "net.msgpack")
        ckpt.save_net(p, single.variables(), {"epoch": 1})
        dual = self._make_state(dual=True)
        warmed = ckpt.warm_start_dual(dual, p, symmetry_noise=0.0)
        for leaf_s, leaf_d in zip(
            jax.tree_util.tree_leaves(single.params),
            jax.tree_util.tree_leaves(warmed.params),
        ):
            assert np.array_equal(leaf_d[0], leaf_s)
            assert np.array_equal(leaf_d[1], leaf_s)

    @pytest.mark.slow
    def test_warm_start_symmetry_noise_diverges_nets(self, tmp_path):
        single = self._make_state(dual=False)
        p = str(tmp_path / "net.msgpack")
        ckpt.save_net(p, single.variables(), {"epoch": 1})
        dual = self._make_state(dual=True)
        warmed = ckpt.warm_start_dual(dual, p, symmetry_noise=1e-3)
        diffs = [
            np.abs(l[0] - l[1]).max()
            for l in jax.tree_util.tree_leaves(warmed.params)
            if np.issubdtype(l.dtype, np.floating) and l[0].std() > 0
        ]
        assert max(diffs) > 0  # nets start distinct
        # but stay close to the loaded weights
        for leaf_s, leaf_d in zip(
            jax.tree_util.tree_leaves(single.params),
            jax.tree_util.tree_leaves(warmed.params),
        ):
            assert np.allclose(leaf_d[0], leaf_s, atol=0.05 * (abs(leaf_s).max() + 1e-3))
