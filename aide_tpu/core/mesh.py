"""Device mesh construction and sharding helpers.

The reference scales only via single-host ``torch.nn.DataParallel``
(/root/reference/train_files/trainchaos_proposed_30cases1labeled.py:183-186).
Here the equivalent is a data-parallel `jax.sharding.Mesh`: batches are
sharded over the ``data`` axis, parameters are replicated, and gradient
reduction is an XLA ``psum`` riding ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aide_tpu.core.config import MeshConfig


_distributed = {"initialized": False}


def maybe_initialize_distributed(cfg: Optional[MeshConfig] = None) -> None:
    """Multi-host (DCN) entry: join this process to the training job named
    by ``mesh.coordinator_address`` before any backend use. Idempotent; a
    no-op when no coordinator is configured (the single-controller case).

    On TPU pods ``jax.distributed.initialize`` autodetects process count /
    index; for CPU testing (gloo collectives) pass both explicitly. After
    this, ``jax.devices()`` spans every host and one global mesh drives
    GSPMD — data-parallel gradient psums ride ICI within a slice and DCN
    across hosts.
    """
    cfg = cfg or MeshConfig()
    if not cfg.coordinator_address or _distributed["initialized"]:
        return
    import os

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # CPU backend needs an explicit cross-process collectives impl
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        cfg.coordinator_address,
        num_processes=cfg.num_processes or None,
        process_id=cfg.process_id if cfg.process_id >= 0 else None,
    )
    _distributed["initialized"] = True


def is_primary() -> bool:
    """True on the process that owns file artifacts (checkpoints, history,
    eval outputs) in a multi-host job — assumes the usual shared
    filesystem; single-process jobs are always primary."""
    return jax.process_index() == 0


def fetch(tree):
    """``jax.device_get`` that works across processes.

    Arrays sharded over other hosts' devices are not fully addressable;
    they are allgathered first (a COLLECTIVE — every process must call
    fetch on the same tree, even a process that will discard the result).
    Single-process: exactly device_get, one batched transfer.
    """
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = []
    for x in leaves:
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            out.append(multihost_utils.process_allgather(x, tiled=True))
        else:
            out.append(x)
    return jax.tree_util.tree_unflatten(treedef, jax.device_get(out))


def make_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    """Build a 1-D (or extended) mesh over the available devices."""
    cfg = cfg or MeshConfig()
    if devices is None:
        devices = jax.devices()
    n = cfg.num_devices or len(devices)
    if n > len(devices):
        raise ValueError(
            f"mesh.num_devices={n} but only {len(devices)} device(s) are "
            "available"
        )
    devices = devices[:n]

    axis_names = [cfg.data_axis]
    axis_sizes = []
    extra = 1
    for name, size in cfg.extra_axes:
        axis_names.append(name)
        axis_sizes.append(size)
        extra *= size
    if n % extra != 0:
        raise ValueError(f"{n} devices not divisible by extra axes {cfg.extra_axes}")
    shape = [n // extra] + axis_sizes
    mesh_devices = np.asarray(devices).reshape(shape)
    return Mesh(mesh_devices, tuple(axis_names))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = "data",
                space_axis: Optional[str] = None):
    """Place a pytree of host arrays on the mesh, batch-sharded on axis 0.

    Arrays whose leading dimension does not divide the data axis (e.g. a
    partial final eval batch) are replicated instead. With a ``space_axis``
    (spatial partitioning), image-like leaves (ndim >= 3) additionally
    shard their H dimension over it — GSPMD spatially partitions the convs
    (halo exchange rides ICI as collective-permutes).
    """
    sharded = batch_sharding(mesh, data_axis)
    repl = replicated(mesh)
    n = mesh.shape[data_axis]
    n_space = mesh.shape[space_axis] if space_axis else 1
    spatial = (
        NamedSharding(mesh, P(data_axis, space_axis)) if space_axis else None
    )

    def put(x):
        if not (hasattr(x, "shape") and x.ndim > 0 and x.shape[0] % n == 0):
            return jax.device_put(x, repl)
        if spatial is not None and x.ndim >= 3 and x.shape[1] % n_space == 0:
            return jax.device_put(x, spatial)
        return jax.device_put(x, sharded)

    return jax.tree_util.tree_map(put, batch)


def place_state(state, mesh: Mesh, dual: bool, net_axis: str = "net"):
    """Place a train state on the mesh.

    A DualTrainState's stacked leaves (leading net axis of size 2 —
    engine/state.py) shard over the mesh's ``net`` axis when it has one:
    each half of the mesh holds and computes one co-teaching net (model
    parallelism; the TPU-native analogue of putting the reference's
    net1/net2 on separate GPUs). Everything else is replicated.
    """
    repl = replicated(mesh)
    if not (dual and net_axis in mesh.axis_names and mesh.shape[net_axis] > 1):
        return jax.device_put(state, repl)
    if mesh.shape[net_axis] != 2:
        raise ValueError(
            f"mesh axis {net_axis!r} must have size 2 (the dual co-teaching "
            f"pair), got {mesh.shape[net_axis]}"
        )
    net_sh = NamedSharding(mesh, P(net_axis))

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == 2:
            return jax.device_put(x, net_sh)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(put, state)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def fit_data_devices(batch_size: int, num_available: int) -> int:
    """Largest device count <= num_available that divides the global batch
    (a batch must shard evenly over the data axis)."""
    for d in range(min(batch_size, num_available), 0, -1):
        if batch_size % d == 0:
            return d
    return 1
