"""Host-side data pipeline: decode-once cache, batching, working labels.

TPU-first redesign of the reference's per-sample DataLoader path
(/root/reference/datasetchaos_proposed/dataset.py:23-107): every slice is
decoded, resized, and normalized ONCE into an in-RAM NumPy cache at
construction; epochs then only index into arrays. All augmentation happens
on device (ops/warp.py), so the host — a single CPU on typical TPU VMs
per-chip share — never touches PIL in the hot loop.

The per-net "working labels" of the proposed trainers (mask1/mask2 with
on-disk tempmask override, dataset.py:37-56) live in a LabelStore: RAM
arrays for training, mirrored to disk in the reference's exact per-task file
conventions on refresh, so runs remain resumable and interoperable.

Normalization: per-image channel mean/std by default (transform.py:146-158;
std uses the N-1 estimator to match torch), or fixed stats from config. The
normalized zero-fill values (0-mean)/std ride along with every batch so
device-side warps fill borders exactly like normalize-after-rotate.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from aide_tpu.data.tasks.base import SliceSpec, Task, resize_image, resize_mask


class LabelStore:
    """Per-net working labels (N, H, W) + disk mirror via the task."""

    def __init__(self, task: Task, specs: Sequence[SliceSpec], targets: np.ndarray):
        self.task = task
        self.specs = list(specs)
        size = targets.shape[1]
        self.labels = [targets.copy(), targets.copy()]  # net 1, net 2
        # row indices mutated since the last device sync (see
        # SlicePipeline.sync_labels_to_device)
        self.dirty = [[], []]
        # pick up any refreshed labels already on disk (resume / interop)
        for net in (1, 2):
            for i, spec in enumerate(self.specs):
                disk = task.read_tempmask(spec, net)
                if disk is not None:
                    if disk.shape != targets.shape[1:]:
                        disk = resize_mask(disk, size)
                    self.labels[net - 1][i] = disk

    def get(self, net: int) -> np.ndarray:
        return self.labels[net - 1]

    def refresh_case(
        self, net: int, indices: Sequence[int], volume: np.ndarray, mirror: bool = True
    ) -> None:
        """Replace the working labels of one case (indices into the slice
        table; volume (S, H, W) binary at img_size) and mirror to disk."""
        lab = self.labels[net - 1]
        for i, sl in zip(indices, volume):
            lab[i] = sl.astype(np.uint8)
        self.dirty[net - 1].extend(int(i) for i in indices)
        if mirror and self.task.tempmask_folder:
            specs = [self.specs[i] for i in indices]
            self.task.write_case_tempmask(specs, volume.astype(np.uint8), net)


_GATHER = None  # lazily-jitted device gather shared by all pipelines
_SCATTER = None  # lazily-jitted in-place label row scatter


def _widen_targets(out):
    import jax.numpy as jnp

    for k in ("target", "target1", "target2"):
        if k in out:
            out[k] = out[k].astype(jnp.int32)
    return out


def _device_gather(data, idx):
    """Gather a batch from the device-resident dataset: one fused program,
    only the (B,) index array crosses the host->device link. Targets are
    widened to int32 on device (stored uint8 to quarter the upload)."""
    global _GATHER
    if _GATHER is None:
        import jax
        import jax.numpy as jnp

        def gather(d, i):
            return _widen_targets(
                {k: jnp.take(v, i, axis=0) for k, v in d.items()}
            )

        _GATHER = jax.jit(gather)
    return _GATHER(data, idx)


class MeshCache:
    """Device-resident dataset sharded over the data axis of a multi-device
    mesh (VERDICT round 2 #5: the decode-once HBM cache must not turn off
    when devices are added).

    The arrays live batch-sharded (leading/data axis, rows padded to a
    multiple of the mesh size). A batch gather for arbitrary shuffled
    indices is an explicit shard_map program — each device serves the rows
    that live in its shard, zero elsewhere, and one collective over the
    data axis assembles the batch (the dataset itself never moves). The
    result comes back batch-sharded when the batch divides the mesh
    (``psum_scatter``: each device receives exactly its output slice),
    replicated otherwise (``psum``; ragged final eval batches need the full
    batch everywhere). Explicit shard_map instead of GSPMD inference keeps
    XLA from ever choosing an all-gather of the full dataset for the gather
    op. Label refresh rows scatter into the shard that owns them
    (out-of-shard updates dropped).

    Traffic model (ring collectives over ICI, S = batch bytes, n = data-axis
    size): the sharded-out gather reduce-scatters S — each device sends
    S*(n-1)/n per step — where the previous psum+slice formulation
    all-reduced it (2x that). A zero-skipping all-to-all would not beat
    this: with shuffled indices the per-(src,dst) row count is data-
    dependent, so static shapes force worst-case B/n-row pads per pair —
    the same S*(n-1)/n on the wire. At the CHAOS operating point (two
    uint8 256x256x3 modalities + two uint8 targets + f32 norm stats
    ~ 0.50 MiB/row) one bs-8 train gather moves S ~ 4.0 MiB: 2.0/3.0/
    3.5 MiB sent per device per step at n=2/4/8 (vs 4.0/6.0/7.0 psum), and
    a bs-32 images-only eval gather S ~ 12 MiB: 6/9/10.5 MiB (vs 12/18/21).
    At ~100 GB/s/link ICI that is well under a millisecond — the gather
    stays latency-, not bandwidth-, bound at this batch size; measured
    equal-values on the virtual mesh (tests/test_multidevice_epoch.py,
    tests/test_meshcache_traffic.py pins the collective choice)."""

    def __init__(self, mesh, data_axis: str, n_rows: int,
                 space_axis: Optional[str] = None):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        self.axis = data_axis
        self.n_dev = mesh.shape[data_axis]
        self.shard_rows = -(-n_rows // self.n_dev)  # ceil
        self.padded_rows = self.shard_rows * self.n_dev
        self.row_sharding = NamedSharding(mesh, P(data_axis))
        # spatial partitioning: evenly-shaped gathers come back with image
        # H additionally sharded over this axis, INSIDE the gather program
        # (no per-step resharding dispatches in the epoch path)
        self.space_axis = (
            space_axis
            if space_axis
            and space_axis in mesh.axis_names
            and mesh.shape[space_axis] > 1
            else None
        )
        self._jitted = {}

    def pad(self, arr: np.ndarray) -> np.ndarray:
        pad = self.padded_rows - arr.shape[0]
        if pad == 0:
            return arr
        return np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])

    def put(self, tree):
        import jax

        return jax.device_put(
            {k: self.pad(np.asarray(v)) for k, v in tree.items()},
            self.row_sharding,
        )

    def gather(self, data, idx):
        import jax

        b = int(idx.shape[0])
        spatial = {
            k: self._spatial_leaf(v) for k, v in data.items()
        }
        key = ("g", b, tuple(sorted((k, spatial[k]) for k in data)))
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                self._make_gather(b % self.n_dev == 0, spatial)
            )
        return self._jitted[key](data, idx)

    def _spatial_leaf(self, v) -> bool:
        """Image-like rows ((H, W[, C]) beyond the row dim) whose H divides
        the space axis shard their H in the gather output."""
        return (
            self.space_axis is not None
            and v.ndim >= 3
            and v.shape[1] % self.mesh.shape[self.space_axis] == 0
        )

    def _make_gather(self, sharded_out: bool, spatial):
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        axis, n_dev, shard_rows = self.axis, self.n_dev, self.shard_rows
        space = self.space_axis if sharded_out else None
        n_space = self.mesh.shape[space] if space else 1
        # ragged (replicated) gathers never shard spatially
        spatial = {k: bool(sp) and space is not None for k, sp in spatial.items()}

        def body(local, idx):
            d = jax.lax.axis_index(axis)
            lo = d * shard_rows
            rel = jnp.clip(idx - lo, 0, shard_rows - 1)
            mask = (idx >= lo) & (idx < lo + shard_rows)

            def serve(v, spatial_leaf):
                part = jnp.take(v, rel, axis=0)
                m = mask.reshape((-1,) + (1,) * (part.ndim - 1))
                part = jnp.where(m, part, jnp.zeros_like(part))
                if sharded_out:
                    # each device needs only ITS slice of the assembled
                    # batch: reduce-scatter moves half the bytes of the
                    # psum+slice formulation (see class docstring)
                    full = jax.lax.psum_scatter(
                        part, axis, scatter_dimension=0, tiled=True
                    )
                else:
                    full = jax.lax.psum(part, axis)
                if spatial_leaf:
                    s = jax.lax.axis_index(space)
                    h_local = full.shape[1] // n_space
                    full = jax.lax.dynamic_slice_in_dim(
                        full, s * h_local, h_local, axis=1
                    )
                return full

            return {k: serve(v, spatial[k]) for k, v in local.items()}

        if sharded_out:
            out_spec = {
                k: P(axis, space) if (space and sp) else P(axis)
                for k, sp in spatial.items()
            }
        else:
            out_spec = {k: P() for k in spatial}
        fn = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(P(self.axis), P()),
            out_specs=out_spec,
        )

        def gather(data, idx):
            return _widen_targets(dict(fn(data, idx)))

        return gather

    def scatter(self, arr, idx: np.ndarray, rows: np.ndarray):
        """Write refreshed label rows into the sharded device copy."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        key = ("s", int(idx.shape[0]))
        if key not in self._jitted:
            axis, shard_rows = self.axis, self.shard_rows

            def body(local, idx, rows):
                d = jax.lax.axis_index(axis)
                lo = d * shard_rows
                in_shard = (idx >= lo) & (idx < lo + shard_rows)
                # out-of-shard updates redirect past the end -> mode='drop'
                rel = jnp.where(in_shard, idx - lo, shard_rows)
                return local.at[rel].set(rows, mode="drop")

            self._jitted[key] = jax.jit(
                jax.shard_map(
                    body,
                    mesh=self.mesh,
                    in_specs=(P(self.axis), P(), P()),
                    out_specs=P(self.axis),
                ),
                donate_argnums=0,
            )
        return self._jitted[key](arr, jnp_asarray_i32(idx), rows)


def jnp_asarray_i32(x):
    import jax.numpy as jnp

    return jnp.asarray(x, jnp.int32)


class SlicePipeline:
    def __init__(
        self,
        task: Task,
        specs: Sequence[SliceSpec],
        img_size: int,
        data_mean: Optional[Sequence[float]] = None,
        data_std: Optional[Sequence[float]] = None,
        working_labels: bool = False,
        cache_dir: Optional[str] = None,
    ):
        self.task = task
        self.specs = list(specs)
        self.img_size = img_size
        n = len(self.specs)
        if n == 0:
            raise ValueError("empty manifest")
        # optional on-disk decode cache: decoding+resizing a CHAOS-sized
        # manifest costs minutes on a 1-core host; a keyed npz makes warm
        # runs (bench reruns, repeated experiments) load in seconds
        cache_file = None
        if cache_dir:
            import hashlib

            def stat_sig(spec: SliceSpec) -> str:
                # size+mtime of every source file: re-annotated masks or
                # regenerated images at the same paths must invalidate the
                # cached decoded arrays (including targets)
                sig = []
                for p in list(spec.image_paths) + [spec.mask_path]:
                    try:
                        st = os.stat(p)
                        sig.append(f"{st.st_size}:{st.st_mtime_ns}")
                    except OSError:
                        sig.append("?")
                return ",".join(sig)

            # two-part key: a stable identity (which dataset/resolution)
            # and a volatile content signature. A changed signature writes
            # a NEW file and prunes the stale siblings of the same
            # identity, so re-annotated sources don't accumulate
            # multi-hundred-MB dead npz files in cache_dir.
            id_key = hashlib.sha1(
                "|".join(
                    [task.decode_fingerprint()]
                    + [repr(s) for s in self.specs]
                    + [str(img_size), str(data_mean), str(data_std)]
                ).encode()
            ).hexdigest()[:16]
            stat_key = hashlib.sha1(
                "|".join(stat_sig(s) for s in self.specs).encode()
            ).hexdigest()[:16]
            self._cache_prefix = os.path.join(cache_dir, f"decode_{id_key}_")
            cache_file = f"{self._cache_prefix}{stat_key}.npz"

        n_mod = 2 if task.two_modal else 1
        # uint8 image cache + per-image affine normalization coefficients:
        # normalized = u8 * scale + fill with scale = 1/(255*std) and
        # fill = -mean/std, applied ON DEVICE inside the jitted steps
        # (engine/steps.batch_images). Shipping uint8 instead of normalized
        # float32 cuts host->device traffic 4x — the dominant epoch cost on
        # tunneled chips — and is lossless: resize_image's PIL path yields
        # integer values anyway.
        self.images = [
            np.zeros((n, img_size, img_size, 3), np.uint8) for _ in range(n_mod)
        ]
        self.scales = [np.zeros((n, 3), np.float32) for _ in range(n_mod)]
        self.fills = [np.zeros((n, 3), np.float32) for _ in range(n_mod)]
        self.targets = np.zeros((n, img_size, img_size), np.uint8)

        fixed = data_mean is not None
        mean_arr = np.asarray(data_mean, np.float32) if fixed else None
        std_arr = np.asarray(data_std, np.float32) if fixed else None

        if cache_file and os.path.exists(cache_file):
            try:
                z = np.load(cache_file)
                for m in range(n_mod):
                    self.images[m] = z[f"images{m}"]
                    self.scales[m] = z[f"scales{m}"]
                    self.fills[m] = z[f"fills{m}"]
                self.targets = z["targets"]
                self._finish_init(working_labels)
                return
            except Exception:
                # corrupt/truncated cache (e.g. a crash predating the
                # atomic-rename write): fall through and re-decode into
                # freshly allocated arrays (a partial load may have rebound
                # some of them)
                try:
                    os.remove(cache_file)
                except OSError:
                    pass
                self.images = [
                    np.zeros((n, img_size, img_size, 3), np.uint8)
                    for _ in range(n_mod)
                ]
                self.scales = [
                    np.zeros((n, 3), np.float32) for _ in range(n_mod)
                ]
                self.fills = [
                    np.zeros((n, 3), np.float32) for _ in range(n_mod)
                ]
                self.targets = np.zeros((n, img_size, img_size), np.uint8)

        for i, spec in enumerate(self.specs):
            imgs, mask = task.decode(spec)
            for m, img in enumerate(imgs):
                resized_u8 = resize_image(img, img_size).astype(np.uint8)
                resized = resized_u8.astype(np.float32) / 255.0
                if fixed:
                    mean, std = mean_arr, std_arr
                else:
                    mean = resized.mean(axis=(0, 1))
                    std = resized.std(axis=(0, 1), ddof=1)
                std = np.maximum(std, 1e-6)
                self.images[m][i] = resized_u8
                self.scales[m][i] = 1.0 / (255.0 * std)
                self.fills[m][i] = -mean / std
            self.targets[i] = resize_mask(mask, img_size)

        if cache_file:
            os.makedirs(cache_dir, exist_ok=True)
            import glob

            arrays = {"targets": self.targets}
            for m in range(n_mod):
                arrays[f"images{m}"] = self.images[m]
                arrays[f"scales{m}"] = self.scales[m]
                arrays[f"fills{m}"] = self.fills[m]
            # crash-safe: write to a tmp path and rename (an interrupted
            # multi-hundred-MB savez would otherwise leave a truncated zip
            # that poisons every later run), and prune stale siblings only
            # AFTER the new cache has landed
            tmp = cache_file + ".tmp.npz"
            np.savez(tmp, **arrays)
            os.replace(tmp, cache_file)
            # also match the pre-stat-key filename decode_<id>.npz (no
            # trailing underscore) so legacy caches don't orphan forever
            legacy = f"{self._cache_prefix.rstrip('_')}.npz"
            for stale in glob.glob(f"{self._cache_prefix}*.npz") + [legacy]:
                if os.path.abspath(stale) == os.path.abspath(cache_file):
                    continue
                try:
                    os.remove(stale)
                except OSError:
                    pass

        self._finish_init(working_labels)

    def _finish_init(self, working_labels: bool) -> None:
        # case grouping (sorted within case by sort_key)
        self.case_slices: Dict[str, List[int]] = {}
        for i, spec in enumerate(self.specs):
            self.case_slices.setdefault(spec.case_id, []).append(i)
        for case, idxs in self.case_slices.items():
            idxs.sort(key=lambda i: self.specs[i].sort_key)
        self.cases = list(self.case_slices)

        self.labels: Optional[LabelStore] = (
            LabelStore(self.task, self.specs, self.targets)
            if working_labels
            else None
        )

        # device-resident cache (see to_device)
        self._device_data = None
        self._device_labels = None
        self._mesh_cache: Optional[MeshCache] = None

    def __len__(self) -> int:
        return len(self.specs)

    # ------------------------- device residency -------------------------

    def to_device(self, mesh=None, data_axis: str = "data",
                  space_axis: Optional[str] = None) -> None:
        """Upload the whole decode-once cache to the accelerator ONCE;
        subsequent batches are gathered ON DEVICE from a (B,) index array.

        On a tunneled/remote chip every per-batch host->device transfer
        pays link latency (measured ~0.25 s per batch regardless of size);
        with the dataset resident in HBM an epoch ships only index arrays.
        A CHAOS-sized train set (990 two-modal 256px slices) is ~520 MB of
        uint8 in HBM — well inside one chip's 16 GB.

        On a multi-device ``mesh`` the arrays are sharded over the data
        axis (each device keeps 1/n of the dataset) and batches assemble
        via an explicit distributed gather (MeshCache) — the cache scales
        with the mesh instead of turning off."""
        import jax

        data = {}
        if self.task.two_modal:
            data["modal1"], data["modal2"] = self.images
            data["scale1"], data["scale2"] = self.scales
            data["fill1"], data["fill2"] = self.fills
        else:
            data["image"] = self.images[0]
            data["scale"] = self.scales[0]
            data["fill"] = self.fills[0]
        data["target"] = self.targets
        if mesh is not None and mesh.devices.size > 1:
            self._mesh_cache = MeshCache(
                mesh, data_axis, len(self.specs), space_axis=space_axis
            )
            self._device_data = self._mesh_cache.put(data)
        else:
            self._mesh_cache = None
            self._device_data = jax.device_put(data)
        self.sync_labels_to_device()

    @property
    def device_image_data(self):
        """The device-resident image arrays (no targets/labels) — the data
        argument for engine.steps.make_predict_all. None unless
        to_device() was called."""
        if self._device_data is None:
            return None
        return {
            k: v for k, v in self._device_data.items()
            if not k.startswith("target")
        }

    def sync_labels_to_device(self) -> None:
        """Push working-label rows mutated on host (refresh_case) into the
        device-resident copy. Only the dirty rows are uploaded and scattered
        in place (donated buffer), padded to a power-of-two row count so the
        scatter program compiles for O(log n) distinct shapes, not one per
        refresh. No-op unless to_device() was called."""
        if self.labels is None:
            return
        if self._device_data is None:
            # host-batch pipelines read labels straight from the store; the
            # dirty index lists are only meaningful for the device mirror and
            # must not grow unboundedly across refresh epochs
            self.labels.dirty = [[], []]
            return
        import jax
        import jax.numpy as jnp

        if self._device_labels is None:  # first sync: full upload
            labels = {"target1": self.labels.get(1), "target2": self.labels.get(2)}
            self._device_labels = (
                self._mesh_cache.put(labels)
                if self._mesh_cache is not None
                else jax.device_put(labels)
            )
            self.labels.dirty = [[], []]
            return

        global _SCATTER
        if _SCATTER is None:
            _SCATTER = jax.jit(
                lambda a, i, r: a.at[i].set(r), donate_argnums=0
            )
        for net in (1, 2):
            idx = self.labels.dirty[net - 1]
            if not idx:
                continue
            pad = 1 << (len(idx) - 1).bit_length()
            idx = np.asarray(idx + [idx[-1]] * (pad - len(idx)), np.int32)
            rows = self.labels.get(net)[idx]
            key = f"target{net}"
            if self._mesh_cache is not None:
                self._device_labels[key] = self._mesh_cache.scatter(
                    self._device_labels[key], idx, rows
                )
            else:
                self._device_labels[key] = _SCATTER(
                    self._device_labels[key], jnp.asarray(idx), rows
                )
        self.labels.dirty = [[], []]

    # ------------------------- batching -------------------------

    def _batch_from(
        self, idx: np.ndarray, images_only: bool = False
    ) -> Dict[str, np.ndarray]:
        if self._device_data is not None:
            data = dict(self._device_data)
            if self._device_labels is not None and not images_only:
                data.update(self._device_labels)
            if images_only:
                # inference batches (case eval / predict) never read the
                # label arrays; gathering them would roughly double the
                # per-batch traffic for nothing
                data = {k: v for k, v in data.items() if not k.startswith("target")}
            if self._mesh_cache is not None:
                return self._mesh_cache.gather(data, np.asarray(idx, np.int32))
            return _device_gather(data, np.asarray(idx, np.int32))
        batch: Dict[str, np.ndarray] = {}
        if self.task.two_modal:
            batch["modal1"] = self.images[0][idx]
            batch["modal2"] = self.images[1][idx]
            batch["scale1"] = self.scales[0][idx]
            batch["scale2"] = self.scales[1][idx]
            batch["fill1"] = self.fills[0][idx]
            batch["fill2"] = self.fills[1][idx]
        else:
            batch["image"] = self.images[0][idx]
            batch["scale"] = self.scales[0][idx]
            batch["fill"] = self.fills[0][idx]
        if images_only:
            return batch
        batch["target"] = self.targets[idx].astype(np.int32)
        if self.labels is not None:
            batch["target1"] = self.labels.get(1)[idx].astype(np.int32)
            batch["target2"] = self.labels.get(2)[idx].astype(np.int32)
        return batch

    def batches(
        self,
        batch_size: int,
        rng: Optional[np.random.Generator] = None,
        shuffle: bool = True,
        drop_last: bool = True,
    ):
        """Epoch iterator (shuffle + drop_last matching the reference's
        train DataLoader, trainchaos_proposed_30cases1labeled.py:207-210)."""
        n = len(self.specs)
        order = np.arange(n)
        if shuffle:
            if rng is None:
                rng = np.random.default_rng(0)
            rng.shuffle(order)
        end = (n // batch_size) * batch_size if drop_last else n
        for s in range(0, end, batch_size):
            yield self._batch_from(order[s : s + batch_size])

    def steps_per_epoch(self, batch_size: int, drop_last: bool = True) -> int:
        n = len(self.specs)
        return n // batch_size if drop_last else -(-n // batch_size)

    # ------------------------- case access -------------------------

    def case_indices(self, case_id: str) -> List[int]:
        return self.case_slices[str(case_id)]

    def batch_at(self, indices, images_only: bool = False) -> Dict[str, np.ndarray]:
        """Batch assembled from explicit slice indices (packed case eval).
        ``images_only`` skips the target/working-label arrays (predict-only
        consumers)."""
        return self._batch_from(np.asarray(indices), images_only=images_only)

    def case_targets(self, case_id: str, net: Optional[int] = None) -> np.ndarray:
        """(S, H, W) stacked working labels (or GT if net is None)."""
        idxs = self.case_indices(case_id)
        src = self.targets if net is None else self.labels.get(net)
        return src[idxs]
