"""Configuration tree for the aide_tpu engine.

One typed config replaces the reference's per-script argparse blocks
(~20 flags each, e.g. /root/reference/train_files/trainchaos_proposed_30cases1labeled.py:28-61).
Every reference flag has a counterpart here; TPU-specific knobs (mesh shape,
compute dtype, TTA view count) are additions.

Configs are plain dataclasses so they can be built in Python, loaded from
JSON, or overridden from the CLI with dotted ``key=value`` pairs.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple


@dataclass
class ModelConfig:
    """Network architecture selection.

    ``name`` covers the reference model zoo:
      single-modal : unet, unetsa, unet2, unet4, unet8, unet16, unet32, unet128
        (/root/reference/models_singlemodalinput/__init__.py:1)
      two-modal    : fuseunet, fuseunetsa, fuseunetsaseparate
        (/root/reference/models_twomodalinputs/__init__.py:1)
    The width variants are one parameterized class here (``base_width``).
    """

    name: str = "fuseunet"
    num_classes: int = 2
    # encoder level-1 channels; 0 = model default (64 for UNet, 32 for
    # FuseUNet, matching the reference widths)
    base_width: int = 0
    learned_bilinear: bool = False  # ConvTranspose upsampling instead of resize+conv
    attention_reduction: int = 16
    attention_dilation: int = 4
    # 'batch' reproduces the reference's BatchNorm2d (cross-replica synced on
    # the data axis); 'group' is the recommended option for tiny per-device
    # batches.
    norm: str = "batch"
    group_norm_groups: int = 8
    # bfloat16 compute with float32 params/statistics is the TPU-native default.
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # rematerialize conv blocks in the backward pass: trades ~20% compute
    # for activation memory, unlocking batch 16+ at 256px on a 16 GB chip
    remat: bool = False
    # lane-dense space-to-depth execution of the narrow stages
    # (models/packed.py): numerically the same network with the same
    # checkpoint format, ~25-30% faster steps on TPU at base_width 32.
    # Supported for the plain fuseunet variant and the no-attention UNet
    # widths (needs H, W divisible by 16 and resize+conv upsampling);
    # attention variants (unetsa/.../fuseunet_sa*) ignore it.
    packed: bool = False
    # fence each packed conv block's output with optimization_barrier:
    # workaround for an XLA TPU backward-fusion miscompile that NaN'd a
    # packed block's entire gradient on real-CHAOS bf16 batches (clean in
    # isolation / on CPU / in f32 / plain layout — models/packed.py
    # BLOCK_BARRIER comment, experiments/naive_nan_probe4.py). Identity
    # math; only compiler fusion scope changes. Default ON: measured cost
    # is +1.2% step time at the CHAOS point (19.48 vs 19.24 s step-epoch,
    # experiments/q5/026_barrier_ab.log) vs a silent training-destroying
    # NaN on real MRI batches without it. Disable for data verified clean.
    packed_block_barrier: bool = True
    # which packed blocks the fence covers. The miscompile has only ever
    # been observed in the ENCODER block-1 backward (modal2_block1's
    # gradient), and the scope bisect (experiments/naive_nan_probe5.py)
    # shows fencing that block alone cures it while up_block4's fence
    # cures nothing — it is pure fusion cost on the largest packed
    # activation. "encoder" (default) fences the block-1 stage only;
    # "all" additionally fences up_block4's conv block (the round-5
    # pre-bisect behavior, kept for paranoid configs).
    packed_block_barrier_scope: str = "encoder"  # encoder | all


@dataclass
class DataConfig:
    """Dataset + augmentation. Mirrors the reference transform pipelines
    (e.g. /root/reference/datasetchaos_proposed/transform.py)."""

    task: str = "chaos"           # chaos | prostate | kidney | breast | synthetic
    variant: str = "proposed"     # proposed (dual working labels) | comparison
    root: str = ""
    train_csv: str = ""
    test_csv: str = ""
    traincase_csv: str = ""
    testcase_csv: str = ""
    labelcase_csv: str = ""
    tempmask_folder: str = ""     # on-disk mirror of refreshed working labels
    img_size: int = 256
    batch_size: int = 4
    eval_batch_size: int = 8
    rotation_degree: float = 60.0   # RandomRotate bound (±)
    hflip_prob: float = 0.5
    # None => per-image mean/std normalization (the reference default,
    # transform.py:146-158); otherwise fixed per-channel stats.
    data_mean: Optional[Tuple[float, ...]] = None
    data_std: Optional[Tuple[float, ...]] = None
    num_tta_views: int = 4          # augset 'augno' (dataset.py:65-83)
    mask_identity: int = 1          # kidney annotator selection (1..3)
    shuffle_seed: int = 0
    # When True the main training view is also randomly augmented on device.
    # The reference augments only the TTA copies; the main image gets
    # resize+normalize only (trainchaos_proposed_30cases1labeled.py:191-197).
    augment_main: bool = False
    # TTA warp implementation: 'auto' (fused Pallas kernel on TPU, 3-shear
    # XLA path on CPU), or an explicit 'pallas' | 'shear' | 'gather'. The
    # trainer pins 'auto' to 'shear' when the mesh has an active 'space'
    # axis: GSPMD partitions the shear rolls cleanly over the sharded H
    # dim, while a Pallas custom call would force an all-gather of the
    # spatially-sharded batch around it.
    warp_method: str = "auto"
    # Keep the whole decode-once cache resident in device HBM and gather
    # batches on device by index (SlicePipeline.to_device). 'auto' (and
    # 'on') enable it on any mesh: single-device keeps one HBM copy,
    # multi-device shards the arrays over the data axis and assembles
    # batches with an explicit distributed gather (data/pipeline.MeshCache).
    # 'off' falls back to per-batch host uploads.
    device_cache: str = "auto"
    # When set, SlicePipeline persists its decoded/resized arrays to a keyed
    # npz under this directory (decode is minutes on 1-core TPU-VM hosts;
    # warm loads are seconds). Key covers manifest + img_size + norm stats.
    decode_cache_dir: str = ""
    # Extra keyword arguments forwarded verbatim to the task constructor —
    # e.g. the synthetic generator's knobs:
    #   data.task_options={"style": "xhard", "two_modal": true,
    #                      "num_cases": 30, "clean_cases": 1}
    # (JSON object syntax in dotted overrides.)
    task_options: dict = field(default_factory=dict)


@dataclass
class OptimConfig:
    """Adam(amsgrad) + StepLR/PolyLR, matching the reference defaults
    (trainchaos_proposed_30cases1labeled.py:231-240)."""

    lr: float = 1e-4
    loss: str = "cedice"              # ce | dice | cedice (criterion select)
    optimizer: str = "amsgrad_adam"   # amsgrad_adam | adam | sgd
    lr_policy: str = "StepLR"         # StepLR | PolyLR | None
    step_size: int = 30
    step_gamma: float = 0.5
    poly_power: float = 0.9
    weight_decay: float = 0.0
    grad_clip_norm: Optional[float] = None


@dataclass
class CoteachConfig:
    """The AIDE dual-network cross co-teaching algorithm knobs
    (trainchaos_proposed_30cases1labeled.py:245-341)."""

    enabled: bool = True
    warmup_epochs: int = 20           # rate = min((e/warmup)^2, 1)
    temperature: float = 1.0          # pseudo-label sharpening
    # exponent convention: 'pow_t' = mask**T (chaos/prostate trainers),
    # 'pow_inv_t' = mask**(1/T) (kidney/breast trainers). Identical at T=1.
    sharpen_mode: str = "pow_t"
    seg_weight: float = 1.0           # segcor_weight[0]
    consistency_weight: float = 10.0  # segcor_weight[1]
    cedice_weight: Tuple[float, float] = (1.0, 1.0)
    ceclass_weight: Tuple[float, ...] = (1.0, 1.0)
    diceclass_weight: Tuple[float, ...] = (1.0, 1.0)
    # fraction of the batch treated as "clean" in the small-loss exchange.
    # The reference hardcodes 2 of batch 4 (":307-310"); breast uses
    # batch_size/2 (trainbreast_dataset3_proposed_272cases25labeled.py:304).
    clean_fraction: float = 0.5
    # label-refresh policy (:528-575): worst `update_percent` of train cases,
    # every epoch during warmup then every `refresh_interval` epochs.
    update_percent: float = 0.25
    refresh_interval: int = 10
    # kidney convention: do not overwrite a working label with an empty
    # prediction (trainkidney_proposed_mask1.py:417)
    refresh_skip_empty: bool = False
    # relative weight noise added per net on single-checkpoint warm start;
    # without it both nets stay bit-identical under deterministic execution
    # and co-teaching degenerates to self-training (the reference diverges
    # only via GPU nondeterminism)
    warm_start_noise: float = 1e-3
    # BN statistics used for the TTA forwards: 'batch' matches the flagship
    # trainer (nets stay in train mode during TTA); 'running' matches the
    # kidney trainers' explicit net.eval() (trainkidney_proposed_mask1.py:267).
    tta_bn: str = "batch"
    # run-time engagement guardrail (no analogue in the reference — it has
    # no defense against the transfer cliff its own protocol can hit).
    # Four oracle-free layers:
    #   0. pre-training bootstrap skill probe (warm-started runs only):
    #      the seeded nets' case dice on the labeled (clean-GT) cases. In
    #      the transfer protocol the bootstrap labels ARE the same source
    #      model's predictions, so this reads the bootstrap quality
    #      directly — below engagement_min_bootstrap_skill (the ~0.2
    #      cliff mapped in experiments/RESULTS.md) the refresh loop cannot
    #      engage and the verdict abstains regardless of how
    #      self-consistent the ramp-end signals look (the a->b control:
    #      cross-net agreement 0.97, retention 0.88, outcome 0.19 below
    #      its own pretrain);
    #   1. structural label half-life check at the FIRST refresh
    #      (refreshable cases / rewrites per epoch >= ~3, else the bootstrap
    #      labels are destroyed before the nets can learn them — the
    #      shipped 2-case real-DICOM setup fails this);
    #   2. per-epoch cross-net prediction agreement in the history
    #      (crossnet_dice);
    #   3. an end-of-ramp (warmup_epochs) verdict: agreement plus the
    #      predicted-vs-BOOTSTRAP-label foreground ratio band (current
    #      labels are self-referential once refresh rewrites them), plus a
    #      logged bootstrap-retention figure.
    # On failure the logged recommendation is to ABSTAIN: deploy the
    # pretrain/bootstrap weights rather than this run's checkpoints
    # (experiments/RESULTS.md, transfer cliff analysis).
    engagement_check: bool = True
    engagement_min_agreement: float = 0.5
    engagement_fg_band: Tuple[float, float] = (0.2, 5.0)
    engagement_min_bootstrap_skill: float = 0.2
    # above the cliff but below this, the margin over pretrain is an
    # inverted U and can be negative (a->m seed 23: bootstrap 0.318,
    # +0.073 over naive yet -0.049 vs its own pretrain): the verdict stays
    # engaged but logs a transition-band caution — validate the deployed
    # checkpoint against the pretrain before shipping
    engagement_clear_skill: float = 0.35


@dataclass
class EvalConfig:
    """Case-wise 3D evaluation (evalchaos_comparison_1cases.py:143-243)."""

    keep_largest_cc: bool = True
    threshold: float = 0.5
    save_png: bool = True
    png_scale: int = 63               # foreground stored as fg*63 (":549")
    output_dir: str = "segmentation_results"
    # (a former `slice_bucket` knob is gone: case eval packs every case's
    # slices into one contiguous stream of eval_batch_size batches —
    # evaluation/case_eval.py — so there is no per-case padding to bucket)


@dataclass
class MeshConfig:
    """Device mesh. The reference's only multi-device story is single-host
    DataParallel (SURVEY §0); here data-parallelism runs over an ICI mesh."""

    data_axis: str = "data"
    num_devices: int = 0              # 0 => all available devices
    # Optional (axis, size) pairs beyond data parallel. Two names are
    # meaningful to the engine:
    #   ("net", 2)    — shard the stacked dual co-teaching nets: each half
    #                   of the mesh holds/computes one net (model parallel;
    #                   core/mesh.place_state)
    #   ("space", k)  — spatially partition the image H dim: GSPMD splits
    #                   the convolutions with halo exchange over ICI
    #                   (core/mesh.shard_batch space_axis)
    # e.g. extra_axes=(("net", 2), ("space", 2)) on 8 chips trains with
    # data=2 x net=2 x space=2.
    extra_axes: Tuple[Tuple[str, int], ...] = ()
    # Multi-host (DCN): set coordinator_address (host:port) on EVERY
    # process to join them into one job (core/mesh.
    # maybe_initialize_distributed). TPU pods autodetect num_processes /
    # process_id — leave them 0 / -1; CPU-backend testing sets both.
    # File artifacts (checkpoints, history, eval outputs) are written by
    # process 0 only, assuming the usual shared filesystem.
    coordinator_address: str = ""
    num_processes: int = 0
    process_id: int = -1


@dataclass
class TrainConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    coteach: CoteachConfig = field(default_factory=CoteachConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    num_epochs: int = 100
    seed: int = 2                     # --torch_seed default
    repetition: int = 200             # experiment id suffix
    checkpoint_dir: str = "checkpoints"
    # 'end' (default): best-epoch state is snapshotted ON DEVICE and all
    # checkpoint files are written once at the end of the run — on a
    # tunneled/remote chip a per-epoch device->host fetch of the full state
    # costs minutes. 'best' writes files immediately at every best epoch
    # (the reference's behavior, trainchaos_proposed...py:500-526).
    checkpoint_flush: str = "end"
    history_dir: str = "history"
    resume_file: str = ""             # warm start (trainkidney_proposed_mask1.py:51)
    # mid-epoch loss lines (the reference's tqdm visibility). 0 = off, the
    # default: each line costs one device->host sync, which stalls the async
    # dispatch pipeline on tunneled/remote backends. Genuinely opt-in.
    log_every_steps: int = 0
    # kidney trainers gate checkpointing until train dice bottoms out
    # (trainkidney_proposed_mask1.py:436-464)
    ascending_checkpoint_gate: bool = False

    @property
    def experiment_name(self) -> str:
        return "{}_temp{}_r{}".format(
            self.model.name, self.coteach.temperature, self.repetition
        )

    # ---------------- serialization / overrides ----------------

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self, **kw) -> str:
        return json.dumps(self.to_dict(), **kw)

    @classmethod
    def from_dict(cls, d: dict) -> "TrainConfig":
        return _build(cls, d)

    @classmethod
    def from_json(cls, s: str) -> "TrainConfig":
        return cls.from_dict(json.loads(s))

    def override(self, pairs: Sequence[str]) -> "TrainConfig":
        """Apply CLI-style dotted overrides, e.g. ``optim.lr=3e-4``."""
        d = self.to_dict()
        for pair in pairs:
            if "=" not in pair:
                raise ValueError(f"override must be key=value, got {pair!r}")
            key, raw = pair.split("=", 1)
            node = d
            parts = key.strip().split(".")
            for p in parts[:-1]:
                if p not in node:
                    raise KeyError(f"unknown config section {p!r} in {key!r}")
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"unknown config key {key!r}")
            node[leaf] = _coerce(raw, node[leaf])
        return TrainConfig.from_dict(d)


def _coerce(raw: str, prev: Any) -> Any:
    raw = raw.strip()
    if isinstance(prev, bool):
        return raw.lower() in ("1", "true", "yes", "on")
    if prev is None or raw.lower() in ("none", "null"):
        try:
            return json.loads(raw)
        except (json.JSONDecodeError, ValueError):
            return None if raw.lower() in ("none", "null") else raw
    if isinstance(prev, (list, tuple)):
        val = json.loads(raw)
        return tuple(val) if isinstance(prev, tuple) else val
    if isinstance(prev, dict):
        return json.loads(raw)
    if isinstance(prev, int) and not isinstance(prev, bool):
        return int(raw)
    if isinstance(prev, float):
        return float(raw)
    return raw


# Knobs that existed in earlier revisions and may appear in saved configs
# (checkpoint resume across versions); loaders skip them silently instead of
# rejecting the whole file.
REMOVED_KEYS = frozenset({"slice_bucket"})


def _build(cls, d: dict):
    """Recursively build nested dataclasses from a plain dict. Unknown keys
    raise — a typo'd field in a saved/hand-written config JSON must not
    silently train with the default (override() already raises; the two
    load paths must agree). REMOVED_KEYS are the one exception."""
    import typing

    unknown = set(d) - {f.name for f in dataclasses.fields(cls)} - REMOVED_KEYS
    if unknown:
        raise KeyError(
            f"{cls.__name__}: unknown config keys {sorted(unknown)}"
        )
    hints = typing.get_type_hints(cls)
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        ftype = hints.get(f.name, f.type)
        if dataclasses.is_dataclass(ftype) and isinstance(v, dict):
            kwargs[f.name] = _build(ftype, v)
        elif isinstance(v, (list, tuple)):
            kwargs[f.name] = tuple(
                tuple(x) if isinstance(x, (list, tuple)) else x for x in v
            )
        else:
            kwargs[f.name] = v
    return cls(**kwargs)
