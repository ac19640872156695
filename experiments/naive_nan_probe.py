"""Bisect the NaN in the real-data supervised (naive) ladder rung.

q5/017: the naive stage (supervised fuseunet, packed bf16, 256 px, bs 4,
cases 37-GT + 10-pseudo) went NaN inside epoch 1 on the chip, while the
SAME data trains fine through the proposed dual-net step (q5/01) and the
same step trains fine on synthetic data (bench --supervised). This probe
runs ONE epoch per variant with per-step loss fetches and reports the
first NaN step, isolating {compute dtype} x {packed} x {batch}:

  python experiments/naive_nan_probe.py --variant bf16_packed
  python experiments/naive_nan_probe.py --variant bf16_plain
  python experiments/naive_nan_probe.py --variant f32_packed
  python experiments/naive_nan_probe.py --variant bf16_packed_bs8

Each prints one JSON line: {"variant", "first_nan_step" (or null),
"losses_head", "epoch1_loss"}.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    "bf16_packed": dict(dtype="bfloat16", packed=True, batch=4),
    "bf16_plain": dict(dtype="bfloat16", packed=False, batch=4),
    "f32_packed": dict(dtype="float32", packed=True, batch=4),
    "bf16_packed_bs8": dict(dtype="bfloat16", packed=True, batch=8),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="bf16_packed", choices=sorted(VARIANTS))
    ap.add_argument("--workdir", default="/tmp/naive_nan_probe")
    ap.add_argument("--img-size", type=int, default=256)
    args = ap.parse_args()
    v = VARIANTS[args.variant]

    import numpy as np

    import chaos_real_ladder as L
    from aide_tpu.engine.trainer import Trainer

    cfg = L.build_cfg(
        "naive", os.path.join(args.workdir, args.variant), 1,
        img_size=args.img_size, batch=v["batch"],
    )
    cfg.model = dataclasses.replace(
        cfg.model, compute_dtype=v["dtype"], packed=v["packed"]
    )
    # share one decode cache across variants
    cfg.data.decode_cache_dir = os.path.join(args.workdir, "decode_cache")

    trainer = Trainer(cfg)
    pipe = trainer.train_pipe
    idxs = pipe.case_indices("10")
    pseudo = L.shipped_pseudo_volume(pipe, "10")
    pipe.targets[idxs] = pseudo
    if pipe._device_data is not None:
        pipe.to_device(trainer.mesh, trainer.cfg.mesh.data_axis)

    # epoch-1 batch sequence exactly like Trainer._train_epoch
    shuffle_rng = np.random.default_rng(
        cfg.seed * 100003 + cfg.data.shuffle_seed * 1009 + 0
    )
    losses = []
    first_nan = None
    for i, batch in enumerate(
        pipe.batches(cfg.data.batch_size, rng=shuffle_rng)
    ):
        batch = trainer._shard(batch)
        trainer.state, m = trainer.train_step(trainer.state, batch)
        loss = float(m["loss"])  # per-step sync: this is a DEBUG probe
        losses.append(round(loss, 4))
        if first_nan is None and not np.isfinite(loss):
            first_nan = i
            # dump the batch composition for the offending step
            print(json.dumps({
                "variant": args.variant, "nan_step": i,
                "batch_targets_fg": [
                    int(np.count_nonzero(np.asarray(t)))
                    for t in np.asarray(batch["target"])
                ] if hasattr(batch["target"], "__len__") else None,
            }), flush=True)
    print(json.dumps({
        "variant": args.variant,
        "first_nan_step": first_nan,
        "steps": len(losses),
        "losses_head": losses[: (first_nan + 2 if first_nan is not None else 8)],
        "epoch1_loss": (
            None
            if not losses or not np.isfinite(losses).all()
            else round(float(np.mean(losses)), 4)
        ),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
