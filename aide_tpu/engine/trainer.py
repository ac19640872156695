"""The training engine: one parameterized loop replacing 17 trainer scripts.

Orchestrates the AIDE algorithm end-to-end (flagship reference:
/root/reference/train_files/trainchaos_proposed_30cases1labeled.py:245-590):

  per epoch:
    rate         <- min((epoch/warmup)^2, 1)                       (:248)
    train        <- jitted co-teaching steps (engine/steps.py)     (:260-330)
    test         <- batched eval loss/dice                         (:344-371)
    test cases   <- batched 3D inference + largest-CC + Dice       (:373-427)
    train cases  <- re-inference vs working labels + kept volumes  (:429-496)
    checkpoint   <- best avg train-case dice (optional kidney
                    ascending/changepoint gate,
                    trainkidney_proposed_mask1.py:436-464)         (:500-526)
    refresh      <- worst update_percent cases per net overwrite
                    their working labels (labeled cases exempt,
                    empty predictions optionally skipped)          (:528-575)

Comparison (plain supervised) configs run the same loop minus TTA/refresh
(e.g. trainchaos_comparison_1case.py:182-345).
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aide_tpu.core import prng
from aide_tpu.core.config import TrainConfig
from aide_tpu.core.logging import record_params, setup_logging
from aide_tpu.core.mesh import (
    fetch,
    is_primary,
    make_mesh,
    maybe_initialize_distributed,
    place_state,
    shard_batch,
)
from aide_tpu.data.pipeline import SlicePipeline
from aide_tpu.data.tasks import build_task
from aide_tpu.engine import checkpoint as ckpt
from aide_tpu.engine import steps as steps_mod
from aide_tpu.engine.state import DualTrainState, TrainState
from aide_tpu.evaluation.case_eval import start_case_evaluation
from aide_tpu.models import build_eval_model, build_model
from aide_tpu.ops.schedules import make_optimizer, rate_schedule


class Trainer:
    def __init__(self, cfg: TrainConfig, task=None, mesh=None, logger=None):
        # multi-host: join the job BEFORE any backend query (no-op unless
        # mesh.coordinator_address is configured)
        maybe_initialize_distributed(cfg.mesh)
        self.cfg = cfg
        self.logger = logger or setup_logging(cfg.history_dir, cfg.experiment_name)
        record_params(self.logger, cfg)

        self.task = task or build_task(cfg)
        self.two_modal = self.task.two_modal
        self.dual = cfg.data.variant == "proposed" and cfg.coteach.enabled

        # ---- pipelines ----
        train_specs = self.task.load_manifest(cfg.data.train_csv, train=True)
        test_specs = self.task.load_manifest(cfg.data.test_csv, train=False)
        self.train_pipe = SlicePipeline(
            self.task, train_specs, cfg.data.img_size,
            cfg.data.data_mean, cfg.data.data_std, working_labels=self.dual,
            cache_dir=cfg.data.decode_cache_dir or None,
        )
        self.test_pipe = SlicePipeline(
            self.task, test_specs, cfg.data.img_size,
            cfg.data.data_mean, cfg.data.data_std, working_labels=False,
            cache_dir=cfg.data.decode_cache_dir or None,
        )
        self.train_cases = (
            self.task.load_case_list(cfg.data.traincase_csv)
            if cfg.data.traincase_csv
            else list(self.train_pipe.cases)
        )
        self.test_cases = (
            self.task.load_case_list(cfg.data.testcase_csv)
            if cfg.data.testcase_csv
            else list(self.test_pipe.cases)
        )
        self.label_cases = set(
            self.task.load_case_list(cfg.data.labelcase_csv)
            if cfg.data.labelcase_csv
            else []
        )
        # optional observation hook, called as on_refresh(epoch) after a
        # label refresh is applied and synced to device
        self.on_refresh = None
        # every refresh decision, in order: (epoch, net, worst-k selection,
        # actually-rewritten subset). Cross-placement equivalence checks
        # (__graft_entry__.dryrun_multichip) compare this log — case
        # SELECTION is a discrete decision that must match across meshes
        # even where float label pixels may differ at the ulp level
        self.refresh_log: list = []
        # end-of-ramp engagement verdict (coteach.engagement_check):
        # {"crossnet_dice", "fg_ratio1", "fg_ratio2", "engaged"} once the
        # warmup ramp completes, None before
        self.engagement = None
        # pre-training bootstrap skill probe:
        # {"bootstrap_skill1", "bootstrap_skill2"}. Two sources:
        #   - warm-started dual runs measure it themselves (the seeded
        #     nets' dice on the labeled clean-GT cases, BEFORE the first
        #     train step — epoch-1 values are already contaminated by
        #     training on those cases);
        #   - callers with an external bootstrap-quality estimate (a small
        #     labeled target validation set; the synthetic protocols feed
        #     their measured pseudo-label quality) may SET it before
        #     run() — an externally set probe suppresses the self-measure.
        # None when no source applies; folded into the end-of-ramp verdict
        # with a cliff (<min_bootstrap_skill -> abstain) and a transition
        # band (<clear_skill -> caution) — experiments/RESULTS.md.
        self.engagement_probe = None
        self._label_fg_cache = None  # per-net label fg totals (see signals)
        # bootstrap working-label snapshot, taken at the FIRST refresh
        # (callers may seed working labels after construction, e.g. the
        # real-data ladder's pseudo seeding): the reference point for the
        # retention/fg engagement signals — signals measured against the
        # CURRENT labels are self-referential once refresh has rewritten
        # them to the nets' own predictions (measured: a fully collapsed
        # fresh-init real-data run scored crossnet 0.95 / fg_ratio 1.25
        # against its own rewritten labels)
        self._bootstrap_labels = None
        self._structural_warned = False

        # ---- model + states ----
        if mesh is None:
            import dataclasses as _dc

            from aide_tpu.core.mesh import fit_data_devices

            import math

            n_avail = cfg.mesh.num_devices or len(jax.devices())
            extra = 1
            for _, size in cfg.mesh.extra_axes:
                extra *= size
            if n_avail % extra != 0:
                raise ValueError(
                    f"{n_avail} devices not divisible by mesh.extra_axes "
                    f"{cfg.mesh.extra_axes}"
                )
            n_fit = fit_data_devices(
                math.gcd(cfg.data.batch_size, cfg.data.eval_batch_size),
                n_avail // extra,
            )
            if n_fit * extra < n_avail:
                # never shrink the mesh silently (an 8-chip pod with the
                # chaos preset's bs 4 would otherwise train on 4 chips)
                self.logger.warning(
                    "MESH SHRUNK: %d devices available but "
                    "gcd(batch_size=%d, eval_batch_size=%d) only shards over "
                    "%d (x%d extra-axis devices) — scale data.batch_size/"
                    "eval_batch_size to use the full mesh",
                    n_avail, cfg.data.batch_size, cfg.data.eval_batch_size,
                    n_fit, extra,
                )
            mesh = make_mesh(_dc.replace(cfg.mesh, num_devices=n_fit * extra))
        self.mesh = mesh
        # spatial partitioning: shard the image H dim over a 'space' mesh
        # axis when configured and the size divides it (core/mesh.py)
        self._space_axis = None
        if (
            "net" in self.mesh.axis_names
            and self.mesh.shape["net"] > 1
            and not self.dual
        ):
            # a net axis only parallelizes the dual co-teaching pair;
            # replicating a single net over it wastes half the mesh
            self.logger.warning(
                "mesh 'net' axis (%d) configured but this is a single-net "
                "(%s) run — the state replicates over it; drop the axis or "
                "grow data/space instead",
                self.mesh.shape["net"], cfg.data.variant,
            )
        if "space" in self.mesh.axis_names and self.mesh.shape["space"] > 1:
            if cfg.data.img_size % self.mesh.shape["space"] == 0:
                self._space_axis = "space"
            else:
                self.logger.warning(
                    "mesh 'space' axis (%d) does not divide img_size=%d — "
                    "spatial partitioning disabled",
                    self.mesh.shape["space"], cfg.data.img_size,
                )
        if self._space_axis is not None:
            # enforced routing (not a docs caveat): the Pallas TTA warp is a
            # custom call GSPMD cannot partition — under a spatially-sharded
            # batch the partitioner would all-gather the full (V*B,H,W,C)
            # tensor around it. The 3-shear XLA formulation partitions
            # cleanly (rolls over the sharded H lower to halo exchanges), so
            # 'auto' pins to it whenever the space axis is live.
            if cfg.data.warp_method == "auto":
                # pin on the trainer's OWN config view — a caller may reuse
                # its TrainConfig for another (space-free) trainer, where
                # 'auto' must still resolve to the Pallas kernel
                import dataclasses as _dc

                cfg = _dc.replace(
                    cfg, data=_dc.replace(cfg.data, warp_method="shear")
                )
                self.cfg = cfg
                self.logger.info(
                    "space axis active: TTA warps routed to the 3-shear XLA "
                    "path (a Pallas custom call would force an all-gather "
                    "of the spatially-sharded batch)"
                )
            elif cfg.data.warp_method in ("pallas", "gather"):
                # 'gather' is equally partition-hostile: per-pixel 2-D
                # gathers force the same all-gather of the sharded batch
                self.logger.warning(
                    f"data.warp_method={cfg.data.warp_method!r} with an "
                    "active space axis: the partitioner will all-gather the "
                    "batch around it — expect degraded scaling; use "
                    "'auto'/'shear'"
                )
        # device-resident dataset: gather batches on device by index so an
        # epoch ships only (B,) index arrays over the host->device link.
        # Multi-device meshes shard the cache over the data axis (MeshCache).
        dc = cfg.data.device_cache
        self.device_resident = dc in ("on", "auto")
        if self.device_resident:
            self.train_pipe.to_device(
                self.mesh, cfg.mesh.data_axis, self._space_axis
            )
            self.test_pipe.to_device(
                self.mesh, cfg.mesh.data_axis, self._space_axis
            )
        self.model = build_model(cfg.model)
        spe = self.train_pipe.steps_per_epoch(cfg.data.batch_size)
        tx = make_optimizer(cfg.optim, spe, cfg.num_epochs)

        dummy = self._dummy_inputs()
        if self.dual:
            v1 = self.model.init(jax.random.key(cfg.seed), *dummy, train=False)
            v2 = self.model.init(jax.random.key(cfg.seed + 1), *dummy, train=False)
            self.state = DualTrainState.create(v1, v2, tx)
            if cfg.resume_file:
                if cfg.resume_file.endswith("_full.msgpack"):
                    # exact resume: params + BN stats + optimizer moments
                    self.state = ckpt.load_train_state(cfg.resume_file, self.state)
                else:
                    # reference-style warm start from one net's weights
                    self.state = ckpt.warm_start_dual(
                        self.state,
                        cfg.resume_file,
                        symmetry_noise=cfg.coteach.warm_start_noise,
                        seed=cfg.seed,
                    )
            self.train_step = steps_mod.make_coteach_train_step(
                self.model, self.two_modal, cfg
            )
        else:
            v1 = self.model.init(jax.random.key(cfg.seed), *dummy, train=False)
            self.state = TrainState.create(v1, tx)
            if cfg.resume_file:
                if cfg.resume_file.endswith("_full.msgpack"):
                    self.state = ckpt.load_train_state(cfg.resume_file, self.state)
                else:
                    restored = ckpt.load_net(cfg.resume_file, v1)
                    self.state = self.state.replace(
                        params=restored["params"],
                        batch_stats=restored.get("batch_stats", {}),
                    )
            self.train_step = steps_mod.make_supervised_train_step(
                self.model, self.two_modal, cfg
            )

        # place the state on the mesh: replicated, except the stacked dual
        # nets shard over a 'net' axis when the mesh has one (model parallel)
        self.state = place_state(self.state, self.mesh, dual=self.dual)

        # forward-only programs (eval/predict) use the barrier-free twin:
        # the packed block barrier only guards the *backward* pass, and in
        # the lax.map inference programs it just blocks fusion (measured as
        # an inflated epoch tail, experiments/bench_r5_repeats.jsonl).
        self.eval_model = build_eval_model(cfg.model)
        self.eval_step = steps_mod.make_eval_step(
            self.eval_model, self.two_modal, cfg, dual=self.dual
        )
        self.augment_batch = (
            steps_mod.make_augment_batch(cfg, self.two_modal)
            if cfg.data.augment_main
            else None
        )
        self.predict_step = steps_mod.make_predict_step(
            self.eval_model, self.two_modal, dual=self.dual
        )
        # whole-eval-set inference as one device program (single-device
        # resident data only — on a sharded cache the per-batch predict
        # path reuses the explicit distributed gather instead); None falls
        # back to per-batch dispatch
        self.predict_all = (
            steps_mod.make_predict_all(self.eval_model, self.two_modal, self.dual)
            if self.device_resident and self.mesh.devices.size == 1
            else None
        )
        # fused test tail: batch eval metrics + test-case label maps from
        # ONE device program (the test slices were otherwise forwarded
        # twice per epoch — once for loss/dice, once for the case maps;
        # both in eval mode, so the logits are identical). Dual only: the
        # dual eval criterion is already per-image, so the ragged final
        # batch masks exactly (engine/steps.make_eval_predict_all).
        self.eval_predict_all = (
            steps_mod.make_eval_predict_all(self.eval_model, self.two_modal, cfg)
            if self.dual and self.predict_all is not None
            else None
        )

        self.root_key = prng.root_key(cfg.seed)
        self.best_dice = 0.0
        # device-side snapshot of the best-epoch state (checkpoint_flush
        # == 'end'): one fused copy program, no host transfer until the end
        self._snapshot_fn = jax.jit(
            lambda t: jax.tree_util.tree_map(jnp.copy, t)
        )
        self._best_snapshot = None
        self._best_meta = None
        # kidney-style changepoint gate state
        self.ascending = not cfg.ascending_checkpoint_gate
        self.changepoint_dice = 0.0
        self.history: List[Dict] = []
        self.start_epoch = 0
        if cfg.resume_file and cfg.resume_file.endswith("_full.msgpack"):
            # exact resume: recover the epoch clock, best/gate bookkeeping,
            # and history alongside the params/BN/optimizer restored above.
            # Working labels come back through the LabelStore's disk mirror
            # (the tempmask folder is part of resumable state, matching
            # datasetchaos_proposed/dataset.py:37-56).
            meta = ckpt.read_meta(cfg.resume_file)
            self.start_epoch = int(meta.get("next_epoch", 0))
            self.best_dice = float(meta.get("best_dice", 0.0))
            self.ascending = bool(meta.get("ascending", self.ascending))
            self.changepoint_dice = float(meta.get("changepoint_dice", 0.0))
            self.history = list(meta.get("history", []))

    # ------------------------------------------------------------------

    def _dummy_inputs(self):
        s = self.cfg.data.img_size
        x = jnp.zeros((1, s, s, 3))
        return (x, x) if self.two_modal else (x,)

    def _shard(self, batch):
        if self.device_resident:
            # already gathered with the right placement (MeshCache emits
            # image leaves spatially sharded when a space axis is on)
            return batch
        return shard_batch(
            batch, self.mesh, self.cfg.mesh.data_axis,
            space_axis=self._space_axis,
        )

    # ------------------------------ epochs ------------------------------

    @staticmethod
    def _accumulate(totals, m):
        """On-device metric accumulation: loss means are weighted by batch
        count, dice sums add directly. No host sync inside the epoch — on
        tunneled/remote backends a per-step fetch costs tens of ms."""
        c = m["count"]
        weighted = {
            k: (v * c if k.startswith("loss") else v) for k, v in m.items()
        }
        if totals is None:
            return weighted
        return {k: totals[k] + weighted[k] for k in weighted}

    @staticmethod
    def _finalize(totals) -> Dict[str, float]:
        if totals is None:
            return {}
        host = fetch(totals)
        count = max(float(host.pop("count")), 1.0)
        return {k: float(v) / count for k, v in host.items()}

    def _train_epoch(self, epoch: int, rate: float) -> Dict[str, float]:
        cfg = self.cfg
        ekey = prng.epoch_key(self.root_key, epoch)
        shuffle_rng = np.random.default_rng(
            cfg.seed * 100003 + cfg.data.shuffle_seed * 1009 + epoch
        )
        totals = None
        rate_arr = jnp.asarray(rate, jnp.float32)
        for i, batch in enumerate(
            self.train_pipe.batches(cfg.data.batch_size, rng=shuffle_rng)
        ):
            batch = self._shard(batch)
            if self.augment_batch is not None:
                # distinct key stream from the TTA views of the same step
                akey = prng.step_key(ekey, 1_000_000 + i)
                batch = self.augment_batch(batch, akey)
            if self.dual:
                skey = prng.step_key(ekey, i)
                self.state, m = self.train_step(self.state, batch, skey, rate_arr)
            else:
                self.state, m = self.train_step(self.state, batch)
            totals = self._accumulate(totals, m)
            if cfg.log_every_steps and (i + 1) % cfg.log_every_steps == 0:
                # opt-in mid-epoch visibility (the reference's tqdm bar);
                # each line costs one device->host sync
                vals = " ".join(
                    "%s: %.3f" % (k, float(v))
                    for k, v in sorted(m.items())
                    if k.startswith("loss")
                )
                self.logger.info(
                    "epoch %d step %d | %s", epoch + 1, i + 1, vals
                )
        return self._finalize(totals)

    def _test_epoch(self) -> Dict[str, float]:
        cfg = self.cfg
        totals = None
        for batch in self.test_pipe.batches(
            cfg.data.eval_batch_size, shuffle=False, drop_last=False
        ):
            if self.dual:
                batch = dict(batch, target1=batch["target"], target2=batch["target"])
            m = self.eval_step(self.state, self._shard(batch))
            totals = self._accumulate(totals, m)
        return self._finalize(totals)

    def _dispatch_fused_test(self, case_timing):
        """Dispatch the fused test eval+predict program; returns a closure
        yielding (test_metrics, testcase_results), or None when the fused
        path does not apply (supervised states, sharded/host pipelines, or
        a testcase list that does not cover the whole test pipe — the batch
        eval metrics are computed from the same packed case stream, so
        partial coverage would change their value)."""
        if self.eval_predict_all is None:
            return None
        from aide_tpu.evaluation.case_eval import (
            _postprocess_case,
            _unpack_width_bits,
            pack_case_stream,
            score_case_volumes,
        )

        pipe = self.test_pipe
        if pipe._device_data is None:
            return None
        eb = self.cfg.data.eval_batch_size
        case_ids, counts, n, padded = pack_case_stream(
            pipe, self.test_cases, eb
        )
        if n != len(pipe) or len(set(padded[:n].tolist())) != n:
            return None
        import time

        t0 = time.perf_counter()
        idx_mat = np.asarray(padded.reshape(-1, eb), np.int32)
        valid = (
            (np.arange(idx_mat.size) < n)
            .astype(np.float32)
            .reshape(idx_mat.shape)
        )
        pending = self.eval_predict_all(
            self.state, pipe._device_data, idx_mat, valid
        )
        dispatch_t = time.perf_counter() - t0
        keep_cc = self.cfg.eval.keep_largest_cc

        def finish():
            t1 = time.perf_counter()
            totals, out = fetch(pending)  # one transfer for metrics + maps
            case_timing["fetch"] = (
                case_timing.get("fetch", 0.0)
                + dispatch_t + time.perf_counter() - t1
            )
            t1 = time.perf_counter()
            count = max(float(totals.pop("count")), 1.0)
            test_m = {k: float(v) / count for k, v in totals.items()}
            out = np.asarray(out)  # (N, 2, B, H, Wp)
            preds = np.moveaxis(out, 1, 0).reshape(2, -1, *out.shape[3:])
            preds = _unpack_width_bits(preds[:, :n], pipe.img_size)
            volumes, offset = [], 0
            for cnt in counts:
                volumes.append(
                    _postprocess_case(preds[:, offset : offset + cnt], keep_cc)
                )
                offset += cnt
            case_timing["host"] = (
                case_timing.get("host", 0.0) + time.perf_counter() - t1
            )
            testcase = score_case_volumes(
                pipe, case_ids, volumes, dual=True, target_net=None,
                timing=case_timing,
            )
            return test_m, testcase

        return finish

    # ------------------------------ refresh ------------------------------

    def _refresh_labels(self, epoch: int, traincase_results) -> None:
        """Overwrite the worst update_percent cases' working labels per net
        (:528-575)."""
        cfg = self.cfg
        k = int(cfg.coteach.update_percent * len(self.train_cases))
        if cfg.coteach.engagement_check and self._bootstrap_labels is None:
            # snapshot the pre-refresh (bootstrap) labels + structural check
            self._bootstrap_labels = {
                n: self.train_pipe.labels.get(n).copy() for n in (1, 2)
            }
            self._structural_refresh_check(k)
        for net_idx in range(2):
            results = traincase_results[net_idx]
            order = np.argsort([r.dice for r in results])
            selected, refreshed = [], []
            for sel in order[:k]:
                r = results[sel]
                selected.append(r.case_id)
                if r.case_id in self.label_cases:
                    continue  # labeled cases are never rewritten (:535)
                vol = r.pred_volume
                if cfg.coteach.refresh_skip_empty and vol.sum() == 0:
                    continue  # kidney convention (trainkidney:417)
                idxs = self.train_pipe.case_indices(r.case_id)
                self.train_pipe.labels.refresh_case(
                    net_idx + 1, idxs, vol, mirror=is_primary()
                )
                refreshed.append(r.case_id)
            # log the FULL worst-k selection, like the reference
            # (trainchaos_proposed_30cases1labeled.py:552,576 prints the
            # selection including labeled/skipped cases); the actually-
            # rewritten subset follows when it differs
            self.logger.info(
                "Mask {} modify for net{}".format(selected, net_idx + 1)
            )
            self.refresh_log.append(
                (epoch, net_idx + 1, tuple(selected), tuple(refreshed))
            )
            if refreshed != selected:
                self.logger.info(
                    "  (rewritten for net{}: {} — labeled/empty cases "
                    "skipped)".format(net_idx + 1, refreshed)
                )
        # refreshed labels live on host; mirror them back into device HBM
        self.train_pipe.sync_labels_to_device()
        if self.on_refresh is not None:
            # observation hook (label-quality oracles in experiments/) —
            # runs after the refresh is fully applied and synced
            self.on_refresh(epoch)

    def _is_refresh_epoch(self, epoch: int) -> bool:
        e1 = epoch + 1
        return e1 <= self.cfg.coteach.warmup_epochs or (
            e1 % self.cfg.coteach.refresh_interval == 0
        )

    # --------------------------- engagement ---------------------------

    def _structural_refresh_check(self, k: int) -> bool:
        """Label half-life check, run once at the first refresh: with
        ``n_refreshable`` rewritable cases and the worst ``k`` rewritten
        per warmup epoch, a case's bootstrap labels survive on average
        ``n_refreshable / k`` epochs. When that half-life is under ~3 the
        bootstrap label information is destroyed before the nets can learn
        it — fresh-init co-teaching then trains on its own early noise
        (measured on the shipped 2-case real-DICOM setup: labels 0.479 ->
        0.23 at the FIRST refresh, 0.12 by ramp end). The reference's
        flagship has n/k = 30/7 ~ 4.3; transfer ladders 24/7 ~ 3.4.
        Mitigations logged: more unlabeled cases, smaller update_percent /
        larger refresh_interval, or a pretrain warm start so model skill
        starts at the labels' level."""
        n_refreshable = sum(
            1 for c in self.train_cases if str(c) not in self.label_cases
        )
        half_life = n_refreshable / max(k, 1)
        ok = half_life >= 3.0 or k == 0
        if not ok and not self._structural_warned:
            self._structural_warned = True
            self.logger.warning(
                "STRUCTURAL REFRESH CHECK FAILED: %d refreshable cases with "
                "worst-%d rewritten per refresh epoch — label half-life "
                "%.1f epochs (< 3). Bootstrap label information will not "
                "survive the warmup ramp; fresh-init co-teaching degrades "
                "into self-training on early noise. Mitigate with more "
                "unlabeled cases, a smaller coteach.update_percent, a "
                "larger refresh_interval, or a pretrain warm start "
                "(resume_file).",
                n_refreshable, k, half_life,
            )
        return ok

    def _bootstrap_skill_probe(self) -> None:
        """Layer 0 of the engagement guardrail: before the first train
        step, score the warm-started nets on the labeled (clean-GT) cases.
        In the transfer protocol (trainprostate_proposed_isbi3ttransfer*)
        the bootstrap working labels are the SAME source model's
        predictions on the target, so this dice reads the bootstrap label
        quality oracle-free — the axis of the ~0.2 engagement cliff
        (experiments/RESULTS.md). Must run pre-training: after even one
        epoch the nets have fit the labeled cases and the reading is
        contaminated upward (a->b control: true skill 0.107, post-epoch-1
        traincase dice already 0.495)."""
        cases = sorted(self.label_cases)
        finish = start_case_evaluation(
            self.predict_step, self.state, self.train_pipe, cases,
            self.cfg.data.eval_batch_size, dual=self.dual,
            target_net="self" if self.dual else None,
            keep_largest_cc=self.cfg.eval.keep_largest_cc,
        )
        res = finish()
        self.engagement_probe = {
            f"bootstrap_skill{n + 1}": float(
                np.mean([r.dice for r in res[n]])
            )
            for n in res
        }
        ms = self.cfg.coteach.engagement_min_bootstrap_skill
        vals = tuple(self.engagement_probe.values())
        if min(vals) < ms:
            self.logger.warning(
                "BOOTSTRAP SKILL PROBE below the engagement cliff: "
                "warm-started nets score %.3f/%.3f case dice on the "
                "labeled clean cases (threshold %.2f). In the transfer "
                "protocol this is the bootstrap label quality — below the "
                "~0.2 cliff the refresh loop cannot mine real quality and "
                "the end state lands under its own pretrain "
                "(experiments/RESULTS.md transfer table). RECOMMENDATION: "
                "abstain — deploy the pretrain/bootstrap weights. The "
                "end-of-ramp verdict will record engaged=false.",
                *(list(vals) + [ms]),
            )
        else:
            self.logger.info(
                "bootstrap skill probe: %.3f/%.3f case dice on labeled "
                "cases (cliff threshold %.2f)", *(list(vals) + [ms]),
            )

    def _engagement_signals(self, traincase) -> Dict[str, float]:
        """Run-time signals of whether the co-teaching refresh is engaging
        (coteach.engagement_check): cross-net agreement Dice over the
        train-case predictions and per-net predicted/working-label
        foreground volume ratios. Cheap host counts over volumes the epoch
        already produced — no extra device work."""
        inter = 0
        fg = [0, 0]
        for r1, r2 in zip(traincase[0], traincase[1]):
            v1 = r1.pred_volume > 0
            v2 = r2.pred_volume > 0
            inter += int(np.count_nonzero(v1 & v2))
            fg[0] += int(np.count_nonzero(v1))
            fg[1] += int(np.count_nonzero(v2))
        denom = fg[0] + fg[1]
        crossnet = 1.0 if denom == 0 else 2.0 * inter / denom
        if self._label_fg_cache is None:
            # foreground reference: the BOOTSTRAP labels once snapshotted
            # (refresh rewrites the current labels to the nets' own
            # predictions, making a current-label ratio self-referentially
            # ~1 even in a collapsed run); before any refresh the current
            # labels ARE the bootstrap. Counted once — full-array
            # traversals are expensive on the 1-core host.
            src = self._bootstrap_labels or {
                n: self.train_pipe.labels.get(n) for n in (1, 2)
            }
            self._label_fg_cache = [
                max(int(np.count_nonzero(src[n])), 1) for n in (1, 2)
            ]
        label_fg = self._label_fg_cache
        return {
            "crossnet_dice": crossnet,
            "fg_ratio1": fg[0] / label_fg[0],
            "fg_ratio2": fg[1] / label_fg[1],
        }

    def _engagement_verdict(self, eng: Dict[str, float]) -> bool:
        """End-of-ramp verdict (epoch == coteach.warmup_epochs): True when
        the run looks engaged. On failure, logs the documented ABSTAIN
        recommendation — fall back to the pretrain/bootstrap weights — the
        guardrail for the transfer cliff mapped in experiments/RESULTS.md
        (below ~0.2 bootstrap label quality nothing engages and the
        best-traincase-dice gate freezes against garbage labels)."""
        ct = self.cfg.coteach
        lo, hi = ct.engagement_fg_band
        ok = (
            eng["crossnet_dice"] >= ct.engagement_min_agreement
            and lo <= eng["fg_ratio1"] <= hi
            and lo <= eng["fg_ratio2"] <= hi
        )
        # bootstrap retention: how much of the seeded label information the
        # refresh loop preserved (Dice of current vs bootstrap labels). Not
        # thresholded — healthy refinement can legitimately move far from a
        # bad bootstrap — but logged for the practitioner and recorded in
        # the verdict (the collapsed real-data run retains ~0.2; healthy
        # synthetic transfer runs 0.4-0.9).
        if self._bootstrap_labels is not None:
            from aide_tpu.evaluation.case_eval import dice3d_np

            eng = dict(
                eng,
                bootstrap_retention1=dice3d_np(
                    self.train_pipe.labels.get(1), self._bootstrap_labels[1]
                ),
                bootstrap_retention2=dice3d_np(
                    self.train_pipe.labels.get(2), self._bootstrap_labels[2]
                ),
            )
        if self._structural_warned:
            # the half-life check failed at the first refresh: bootstrap
            # information cannot have survived the ramp regardless of how
            # self-consistent the nets now look
            ok = False
        probe_ok = True
        band = None
        if self.engagement_probe is not None:
            eng = dict(eng, **self.engagement_probe)
            q = min(self.engagement_probe.values())
            if q < ct.engagement_min_bootstrap_skill:
                # below the bootstrap-quality cliff the ramp-end
                # statistical signals are self-consistent but vacuous
                # (measured a->b control: agreement 0.97, retention 0.88,
                # outcome 0.19 under its own pretrain) — the probe is the
                # signal that can actually see it
                band, probe_ok, ok = "below_cliff", False, False
            elif q < ct.engagement_clear_skill:
                band = "transition"
                self.logger.warning(
                    "bootstrap quality %.3f is in the transition band "
                    "[%.2f, %.2f): the margin over pretrain is an inverted "
                    "U here and can be negative (a->m seed 23: +0.073 over "
                    "naive, -0.049 vs its own pretrain). CAUTION: validate "
                    "the deployed checkpoint against the pretrain weights "
                    "on target validation data before shipping.",
                    q, ct.engagement_min_bootstrap_skill,
                    ct.engagement_clear_skill,
                )
            else:
                band = "clear"
        self.engagement = {
            **eng, "engaged": ok, "structural_ok": not self._structural_warned,
            "bootstrap_skill_ok": probe_ok,
            **({"bootstrap_band": band} if band else {}),
        }
        if ok:
            self.logger.info(
                "engagement check OK at end of ramp: cross-net agreement "
                "%.3f, fg ratios %.2f/%.2f",
                eng["crossnet_dice"], eng["fg_ratio1"], eng["fg_ratio2"],
            )
        else:
            self.logger.warning(
                "ENGAGEMENT CHECK FAILED at end of warmup ramp: cross-net "
                "agreement %.3f (min %.3f), predicted-vs-bootstrap-label "
                "foreground ratios %.2f/%.2f (band %.2f-%.2f), structural "
                "half-life check %s. The co-teaching refresh is not "
                "engaging — typical causes: bootstrap working labels below "
                "the ~0.2-quality cliff, a collapsed net, or too few "
                "refreshable cases per rewrite. RECOMMENDATION: abstain — "
                "deploy the pretrain/bootstrap weights instead of this "
                "run's checkpoints (experiments/RESULTS.md, transfer "
                "ladder).",
                eng["crossnet_dice"], ct.engagement_min_agreement,
                eng["fg_ratio1"], eng["fg_ratio2"], lo, hi,
                "failed" if self._structural_warned else "passed",
            )
        return ok

    # ---------------------------- checkpoint ----------------------------

    def _bookkeeping_meta(self, next_epoch: int) -> Dict:
        """Resume bookkeeping persisted in full-state checkpoint sidecars."""
        return {
            "next_epoch": int(next_epoch),
            "best_dice": float(self.best_dice),
            "ascending": bool(self.ascending),
            "changepoint_dice": float(self.changepoint_dice),
            "history": list(self.history),
        }

    def _maybe_checkpoint(
        self, epoch: int, avg_dice: float, test_metrics, epoch_row=None
    ) -> bool:
        cfg = self.cfg
        if cfg.ascending_checkpoint_gate and not self.ascending:
            if epoch > 0 and self.changepoint_dice < avg_dice:
                self.ascending = True
                self.best_dice = self.changepoint_dice
            else:
                self.changepoint_dice = avg_dice
                return False
        if avg_dice <= self.best_dice:
            return False
        self.best_dice = avg_dice
        self.logger.info("Best Checkpoint {} Saving...".format(epoch + 1))
        meta = {
            "epoch": epoch + 1,
            "traincase_dice": avg_dice,
            **{k: float(v) for k, v in test_metrics.items()},
        }
        if not self.dual:
            # the reference's comparison trainers embed the epoch-metric
            # history inside the checkpoint itself, INCLUDING the best
            # epoch's own row (trainchaos_comparison_1case.py:127-128,
            # 206-230 appends before saving). run_epoch appends to
            # self.history only after checkpointing, so the current row is
            # passed in — it has no timing fields yet (the epoch is still
            # running), so timing fields are stripped from every row to keep
            # the embedded schema uniform. full_meta's resume history
            # (bookkeeping override below) intentionally omits the current
            # row: resume replays this epoch.
            hist = [
                {k: v for k, v in r.items() if not k.startswith("time")}
                for r in self.history
            ]
            meta["history"] = hist + (
                [epoch_row] if epoch_row is not None else []
            )
        # best-epoch artifacts (per-net exports + full state). The full
        # state REPLAYS this epoch's refresh + history row on resume
        # (next_epoch = epoch, both happen after this save); the end-of-run
        # `_last_full` file is the exact continuation artifact.
        full_meta = dict(meta, **self._bookkeeping_meta(epoch))
        if cfg.checkpoint_flush == "best":
            # reference-style: write files immediately (one batched fetch)
            ckpt.save_best_bundle(
                cfg.checkpoint_dir, cfg.experiment_name,
                ckpt.state_tree(self.state), meta, full_meta, dual=self.dual,
            )
        else:
            # snapshot on device; flush_checkpoints() writes the files
            self._best_snapshot = self._snapshot_fn(ckpt.state_tree(self.state))
            self._best_meta = (meta, full_meta)
        # prostate trainers back up the best temp-mask folder
        # (trainprostate_proposed_isbi3ttransferisbidx.py:473-476).
        # Gate and path read the SAME field: an injected task with
        # tempmask_folder="" must not turn src into the dataset root
        # (copytree of the whole dataset per best epoch).
        if self.dual and self.task.tempmask_folder and is_primary():
            src = os.path.join(self.task.root, self.task.tempmask_folder)
            if os.path.isdir(src):
                shutil.copytree(src, src.rstrip("/") + "_best", dirs_exist_ok=True)
        return True

    def flush_checkpoints(self) -> None:
        """Write the device-side best-epoch snapshot to disk (no-op when
        checkpoint_flush == 'best' — files were written immediately — or
        when no best epoch happened yet)."""
        if self._best_snapshot is None:
            return
        meta, full_meta = self._best_meta
        ckpt.save_best_bundle(
            self.cfg.checkpoint_dir, self.cfg.experiment_name,
            self._best_snapshot, meta, full_meta, dual=self.dual,
        )

    # ------------------------------- run -------------------------------

    def run_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        ts = time.time()
        rate = rate_schedule(epoch, cfg.coteach.warmup_epochs) if self.dual else 0.0
        phases: Dict[str, float] = {}

        train_m = self._train_epoch(epoch, rate)
        phases["time_train"] = time.time() - ts

        # fetch/host split of the case phase (case_eval timing contract):
        # attributes time_cases drift to the tunnel link vs the 1-core host
        case_timing: Dict[str, float] = {}
        fused_finish = self._dispatch_fused_test(case_timing)
        if fused_finish is None:
            test_m = self._test_epoch()
            phases["time_test"] = time.time() - ts - sum(phases.values())
            # both case-eval inference passes dispatch before either fetch:
            # the host post-processing of the test cases overlaps the
            # train-case device compute (same overlap the fused branch gets)
            finish_testcase = start_case_evaluation(
                self.predict_step, self.state, self.test_pipe,
                self.test_cases, cfg.data.eval_batch_size, dual=self.dual,
                target_net=None, keep_largest_cc=cfg.eval.keep_largest_cc,
                predict_all=self.predict_all, timing=case_timing,
            )
            finish_traincase = start_case_evaluation(
                self.predict_step, self.state, self.train_pipe,
                self.train_cases, cfg.data.eval_batch_size, dual=self.dual,
                target_net="self" if self.dual else None,
                keep_largest_cc=cfg.eval.keep_largest_cc,
                keep_volumes=self.dual,
                predict_all=self.predict_all, timing=case_timing,
            )
            testcase = finish_testcase()
            traincase = finish_traincase()
        else:
            # overlapped tail: the fused test program and ALL train-case
            # re-inference chunks are dispatched before any fetch, so the
            # device runs the whole tail back to back while the host
            # fetches + post-processes results as they land (test-case CC
            # and metrics run during the train-case device compute)
            finish_train = start_case_evaluation(
                self.predict_step, self.state, self.train_pipe,
                self.train_cases, cfg.data.eval_batch_size, dual=self.dual,
                target_net="self",
                keep_largest_cc=cfg.eval.keep_largest_cc,
                keep_volumes=True,
                predict_all=self.predict_all, timing=case_timing,
            )
            test_m, testcase = fused_finish()
            phases["time_test"] = time.time() - ts - sum(phases.values())
            traincase = finish_train()
        phases["time_cases"] = time.time() - ts - sum(phases.values())

        case_means = {
            f"traincase_dice{n + 1}": float(
                np.mean([r.dice for r in traincase[n]])
            )
            for n in traincase
        }
        case_means.update(
            {
                f"testcase_dice{n + 1}": float(
                    np.mean([r.dice for r in testcase[n]])
                )
                for n in testcase
            }
        )
        if self.dual:
            avg_dice = (
                case_means["traincase_dice1"] + case_means["traincase_dice2"]
            ) / 2.0
        else:
            avg_dice = case_means["traincase_dice1"]

        row_metrics = {
            "epoch": epoch + 1,
            **{f"train_{k}": v for k, v in train_m.items()},
            **{f"test_{k}": v for k, v in test_m.items()},
            **case_means,
        }
        if self.dual and cfg.coteach.engagement_check:
            eng = self._engagement_signals(traincase)
            # crossnet agreement rides the history (a "dice" key: the
            # cross-placement equivalence gates bucket it with the other
            # dice tolerances); fg ratios go to the ramp-end verdict log
            row_metrics["crossnet_dice"] = eng["crossnet_dice"]
            if epoch + 1 == cfg.coteach.warmup_epochs:
                self._engagement_verdict(eng)
        self._maybe_checkpoint(epoch, avg_dice, test_m, epoch_row=row_metrics)
        phases["time_ckpt"] = time.time() - ts - sum(phases.values())
        if self.dual and self._is_refresh_epoch(epoch):
            self._refresh_labels(epoch, traincase)
        phases["time_refresh"] = time.time() - ts - sum(phases.values())

        dt = time.time() - ts
        row = {
            **row_metrics,
            **{k: round(v, 2) for k, v in phases.items()},
            # sub-phases of time_cases (kept out of ``phases`` — the
            # incremental sum there must only see disjoint phases)
            "time_cases_fetch": round(case_timing.get("fetch", 0.0), 2),
            "time_cases_host": round(case_timing.get("host", 0.0), 2),
            "time": dt,
        }
        self.history.append(row)
        self._log_epoch(row)
        return row

    def _log_epoch(self, row: Dict[str, float]) -> None:
        cfg = self.cfg
        e = row["epoch"]
        if self.dual:
            for n in (1, 2):
                self.logger.info(
                    "epoch[%d/%d]: train_loss%d: %.3f | test_loss%d: %.3f | "
                    "train_dice%d: %.3f | test_dice%d: %.3f || "
                    "traincase_dice%d: %.3f || testcase_dice%d: %.3f || time: %.1f"
                    % (
                        e, cfg.num_epochs, n, row.get(f"train_loss{n}", 0.0),
                        n, row.get(f"test_loss{n}", 0.0),
                        n, row.get(f"train_dice{n}_sum", 0.0),
                        n, row.get(f"test_dice{n}_sum", 0.0),
                        n, row.get(f"traincase_dice{n}", 0.0),
                        n, row.get(f"testcase_dice{n}", 0.0),
                        row["time"],
                    )
                )
        else:
            self.logger.info(
                "epoch[%d/%d]: train_loss: %.3f | test_loss: %.3f | "
                "train_dice: %.3f | test_dice: %.3f || traincase_dice: %.3f || "
                "testcase_dice: %.3f || time: %.1f"
                % (
                    e, cfg.num_epochs, row.get("train_loss", 0.0),
                    row.get("test_loss", 0.0), row.get("train_dice_sum", 0.0),
                    row.get("test_dice_sum", 0.0),
                    row.get("traincase_dice1", 0.0),
                    row.get("testcase_dice1", 0.0), row["time"],
                )
            )

    def run(self, num_epochs: Optional[int] = None) -> List[Dict]:
        # explicit None check: run(0) must be a no-op, not the full run
        n = self.cfg.num_epochs if num_epochs is None else num_epochs
        self.logger.info("Start Training ({})".format(self.cfg.data.task))
        if self.start_epoch:
            self.logger.info("Resuming at epoch %d", self.start_epoch + 1)
        if (
            self.dual
            and self.cfg.coteach.engagement_check
            and self.engagement_probe is None
            and self.start_epoch == 0
            and n > 0
            and self.cfg.resume_file
            and not self.cfg.resume_file.endswith("_full.msgpack")
            and self.label_cases
        ):
            # warm-started dual run: measure bootstrap skill before the
            # first train step (see _bootstrap_skill_probe)
            self._bootstrap_skill_probe()
        try:
            for epoch in range(self.start_epoch, n):
                self.run_epoch(epoch)
            unwinding = False
        except BaseException:
            unwinding = True
            raise
        finally:
            # a crash or tunnel drop mid-run must not lose the device-side
            # best-epoch snapshot (checkpoint_flush='end') or the history:
            # flushing is one batched fetch, cheap even on the failure path.
            # If the flush itself fails while we are already unwinding (the
            # fetch may need the very tunnel that dropped), log and let the
            # ORIGINAL error propagate instead of masking it; on the success
            # path a flush failure still raises.
            try:
                self._save_history()
                self.flush_checkpoints()
            except Exception:
                if not unwinding:
                    raise
                self.logger.exception(
                    "failure-path checkpoint/history flush failed"
                )
        # exact-continuation artifact: state as of the END of epoch n, with
        # the epoch clock / best-gate / history bookkeeping in the sidecar.
        # Resuming it reproduces `train(n+k)` exactly (working labels return
        # through the tempmask disk mirror).
        ckpt.save_train_state(
            os.path.join(
                self.cfg.checkpoint_dir,
                f"{self.cfg.experiment_name}_last_full.msgpack",
            ),
            self.state,
            self._bookkeeping_meta(n),
        )
        return self.history

    def _save_history(self) -> None:
        """Persist the epoch-metric rows (the comparison trainers keep a
        'history' dict inside their checkpoints,
        trainchaos_comparison_1case.py:127-128,206-230)."""
        import json

        if not is_primary():
            return
        os.makedirs(self.cfg.history_dir, exist_ok=True)
        path = os.path.join(
            self.cfg.history_dir, f"{self.cfg.experiment_name}_history.json"
        )
        with open(path, "w") as fh:
            json.dump(self.history, fh, indent=2)
