"""One process of a multi-host (DCN) data-parallel training job.

Usage (one invocation per process, same coordinator on each):

    python experiments/multihost_runner.py \
        --coordinator 127.0.0.1:29800 --num-processes 2 --process-id 0 \
        --workdir /tmp/mh0 --out /tmp/mh0/result.json

On CPU (testing) each process exposes ``--local-devices`` virtual devices
and the job trains over their union — the same code path a TPU pod uses,
where ``jax.distributed.initialize`` autodetects the topology
(core/mesh.maybe_initialize_distributed). Runs the synthetic co-teaching
task for two epochs and dumps the history rows + a digest of the working
labels for cross-process comparison (tests/test_multihost.py).
"""

import argparse
import hashlib
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    )

    from aide_tpu.core.config import ModelConfig, TrainConfig
    from aide_tpu.data.tasks.synthetic import SyntheticTask
    from aide_tpu.engine.trainer import Trainer

    cfg = TrainConfig()
    cfg.model = ModelConfig(name="unet2", compute_dtype="float32", norm="batch")
    cfg.data.task = "synthetic"
    cfg.data.variant = "proposed"
    cfg.data.img_size = 16
    cfg.data.batch_size = 8
    cfg.data.eval_batch_size = 8
    cfg.data.num_tta_views = 2
    cfg.coteach.warmup_epochs = 2
    cfg.num_epochs = args.epochs
    cfg.mesh.coordinator_address = args.coordinator
    cfg.mesh.num_processes = args.num_processes
    cfg.mesh.process_id = args.process_id
    cfg.checkpoint_dir = os.path.join(args.workdir, "ckpt")
    cfg.history_dir = os.path.join(args.workdir, "hist")

    # identical deterministic data per process (same seed => same bytes)
    task = SyntheticTask(
        root=os.path.join(args.workdir, "synth"),
        tempmask_folder="tempmasks",
        num_cases=4,
        slices_per_case=5,
        size=16,
        noisy_fraction=0.5,
        seed=3,
    )
    trainer = Trainer(cfg, task=task)
    history = trainer.run(args.epochs)

    import jax

    labels = {
        str(net): hashlib.sha1(
            trainer.train_pipe.labels.get(net).tobytes()
        ).hexdigest()
        for net in (1, 2)
    }
    result = {
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "mesh_size": int(trainer.mesh.devices.size),
        "history": [
            {k: v for k, v in row.items() if not k.startswith("time")}
            for row in history
        ],
        "labels_sha": labels,
        "wrote_checkpoints": sorted(os.listdir(cfg.checkpoint_dir))
        if os.path.isdir(cfg.checkpoint_dir)
        else [],
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(f"process {args.process_id} done: {args.out}")


if __name__ == "__main__":
    main()
