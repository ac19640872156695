"""Checkpoint save/load (msgpack via flax.serialization + JSON sidecar).

The reference saves ``{'net': state_dict, 'loss', 'epoch'}`` gated on best
train-case Dice (/root/reference/train_files/
trainchaos_proposed_30cases1labeled.py:500-526) and resumes weights-only
(trainkidney_proposed_mask1.py:180-182). Here per-net weight exports keep
that contract (msgpack instead of pickle), and the full train state —
including optimizer moments, which the reference drops — can be saved for
exact resume.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
from flax import serialization

from aide_tpu.core.mesh import fetch, is_primary
from aide_tpu.engine.state import DualTrainState, TrainState  # noqa: F401


def _write(path: str, tree: Any, meta: Dict) -> None:
    # ONE batched device->host transfer first: to_bytes would otherwise
    # fetch each leaf in its own round trip, which on a tunneled chip turns
    # a checkpoint into minutes (hundreds of leaves x link latency).
    # fetch() is a COLLECTIVE on multi-host jobs — every process reaches it
    # — but only the primary touches the (shared) filesystem.
    host_tree = fetch(tree)
    if not is_primary():
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(serialization.to_bytes(host_tree))
    with open(path + ".json", "w") as fh:
        json.dump(meta, fh, indent=2)


def read_meta(path: str) -> Dict:
    with open(path + ".json") as fh:
        return json.load(fh)


def save_net(path: str, variables: Dict, meta: Dict) -> None:
    """Export one network's weights (+BN stats), reference-style gate file."""
    _write(path, variables, meta)


def load_net(path: str, template: Dict) -> Dict:
    with open(path, "rb") as fh:
        return serialization.from_bytes(template, fh.read())


def state_tree(state) -> Dict:
    """The full-state pytree (params + BN + optimizer + step clock)."""
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_best_bundle(
    dir_path: str, prefix: str, tree: Dict, meta: Dict, full_meta: Dict,
    dual: bool,
) -> None:
    """All best-epoch artifacts (per-net exports + full state) from ONE
    batched device->host transfer of a ``state_tree``-shaped pytree.

    Unstacking per-net leaves ON DEVICE (``net_variables``) would emit
    hundreds of tiny slice programs, each a round trip on a tunneled chip
    (measured: minutes per checkpoint). Here the stacked tree is fetched
    once and sliced with NumPy on host."""
    host = fetch(tree)
    if dual:
        for net in (1, 2):
            v = {
                "params": jax.tree_util.tree_map(
                    lambda x, n=net: x[n - 1], host["params"]
                )
            }
            stats = jax.tree_util.tree_map(
                lambda x, n=net: x[n - 1], host["batch_stats"]
            )
            if stats:
                v["batch_stats"] = stats
            _write(
                os.path.join(
                    dir_path, f"{prefix}_net{net}_besttraincasedice.msgpack"
                ),
                v,
                dict(meta, net=net),
            )
    else:
        v = {"params": host["params"]}
        if host["batch_stats"]:
            v["batch_stats"] = host["batch_stats"]
        _write(
            os.path.join(dir_path, f"{prefix}_besttraincasedice.msgpack"),
            v,
            meta,
        )
    _write(os.path.join(dir_path, f"{prefix}_full.msgpack"), host, full_meta)


def save_train_state(path: str, state, meta: Dict) -> None:
    """Full state (params + BN stats + optimizer) for exact resume."""
    _write(path, state_tree(state), meta)


def load_train_state(path: str, state):
    with open(path, "rb") as fh:
        restored = serialization.from_bytes(state_tree(state), fh.read())
    return state.replace(**restored)


def warm_start_dual(
    state: DualTrainState, net_ckpt_path: str, symmetry_noise: float = 1e-3,
    seed: int = 0,
) -> DualTrainState:
    """Load one pretrained single-net checkpoint into BOTH nets (the kidney
    trainers' --resumefile warm start, trainkidney_proposed_mask1.py:180-182).

    ``symmetry_noise`` adds independent relative Gaussian noise to each
    net's weights. This is load-bearing: with bit-identical nets, identical
    batches, and deterministic TPU execution, both nets receive identical
    gradients forever and co-teaching degenerates into self-training (the
    reference relies on accidental GPU-side nondeterminism to diverge).
    """
    import jax.numpy as jnp

    template = state.net_variables(0)
    restored = load_net(net_ckpt_path, template)

    key_holder = [jax.random.key(seed)]

    def fill(s, r):
        stacked = s.at[0].set(r).at[1].set(r)
        if symmetry_noise and jnp.issubdtype(stacked.dtype, jnp.floating):
            key_holder[0], sub = jax.random.split(key_holder[0])
            scale = symmetry_noise * (jnp.std(r) + 1e-8)
            noise = scale * jax.random.normal(sub, stacked.shape, stacked.dtype)
            stacked = stacked + noise
        return stacked

    stacked_params = jax.tree_util.tree_map(fill, state.params, restored["params"])
    new = state.replace(params=stacked_params)
    if "batch_stats" in restored and restored["batch_stats"]:
        stacked_stats = jax.tree_util.tree_map(
            lambda s, r: s.at[0].set(r).at[1].set(r),
            state.batch_stats,
            restored["batch_stats"],
        )
        new = new.replace(batch_stats=stacked_stats)
    return new
