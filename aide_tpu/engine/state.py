"""Train state containers (single-net and stacked dual-net).

The dual-network co-teaching pair is held as ONE pytree whose leaves carry a
leading net axis of size 2 — the two networks are computed with `jax.vmap`
over that axis, so XLA sees a single fused program instead of the
reference's two sequential forward/backward passes with
``retain_graph=True`` (/root/reference/train_files/
trainchaos_proposed_30cases1labeled.py:322-325).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    """Single network: params + BN stats + optimizer state."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            tx=tx,
        )

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def stack_trees(a, b):
    """Stack two identically-shaped pytrees along a new leading net axis."""
    return jax.tree_util.tree_map(lambda x, y: jnp.stack([x, y]), a, b)


def unstack_tree(t, idx: int):
    return jax.tree_util.tree_map(lambda x: x[idx], t)


class DualTrainState(struct.PyTreeNode):
    """Two networks stacked on a leading axis; one optimizer state over the
    stacked params (optax transforms are elementwise over leaves, so the
    moments simply carry the net axis too)."""

    step: jnp.ndarray
    params: Any          # leaves (2, ...)
    batch_stats: Any     # leaves (2, ...)
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, variables1, variables2, tx):
        params = stack_trees(variables1["params"], variables2["params"])
        stats = stack_trees(
            variables1.get("batch_stats", {}), variables2.get("batch_stats", {})
        )
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=stats,
            opt_state=tx.init(params),
            tx=tx,
        )

    def net_variables(self, idx: int):
        """Unstacked variables of one net (for single-net export/eval)."""
        v = {"params": unstack_tree(self.params, idx)}
        stats = unstack_tree(self.batch_stats, idx)
        if stats:
            v["batch_stats"] = stats
        return v

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )
