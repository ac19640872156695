"""Workaround bisect for the full-graph packed bf16 NaN (probe3: the
isolated block is clean on the chip — the failure needs the surrounding
graph, i.e. an XLA fusion-context bug).

Variants, each computing full-model grads on the step-0 batch:
  base     — PackedFuseUNet bf16, loss = cedice (probe2's repro)
  logits2  — same model, loss = sum(logits^2): is the loss irrelevant?
  barrier  — packed.BLOCK_BARRIER = True (optimization_barrier on the
             packed block outputs, stops cross-block backward fusion)
  remat    — cfg.model.remat = True (recompute backward, different fusion)

Prints one JSON line per variant: nonfinite grad leaf count + names.

  python experiments/naive_nan_probe4.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import argparse
    import dataclasses

    import numpy as np

    import jax
    import jax.numpy as jnp

    import chaos_real_ladder as L
    from aide_tpu.engine import steps as steps_mod
    from aide_tpu.engine.trainer import Trainer
    from aide_tpu.models import build_model
    from aide_tpu.models import packed as packed_mod

    ap = argparse.ArgumentParser()
    ap.add_argument("--img-size", type=int, default=256)
    ap.add_argument("--base-width", type=int, default=0)
    args = ap.parse_args()

    base_cfg = L.build_cfg(
        "naive", "/tmp/naive_nan_probe4", 1,
        img_size=args.img_size, base_width=args.base_width,
    )
    trainer = Trainer(base_cfg)  # decode + device data once
    pipe = trainer.train_pipe
    idxs = pipe.case_indices("10")
    pipe.targets[idxs] = L.shipped_pseudo_volume(pipe, "10")
    if pipe._device_data is not None:
        pipe.to_device(trainer.mesh, trainer.cfg.mesh.data_axis)
    shuffle_rng = np.random.default_rng(
        base_cfg.seed * 100003 + base_cfg.data.shuffle_seed * 1009 + 0
    )
    batch = next(pipe.batches(base_cfg.data.batch_size, rng=shuffle_rng))

    def run_variant(name, barrier=False, remat=False, loss_kind="cedice"):
        packed_mod.BLOCK_BARRIER = barrier
        cfg = dataclasses.replace(
            base_cfg, model=dataclasses.replace(base_cfg.model, remat=remat)
        )
        model = build_model(cfg.model)
        x = jnp.zeros((1, cfg.data.img_size, cfg.data.img_size, 3))
        variables = model.init(jax.random.key(cfg.seed), x, x, train=False)
        forward = steps_mod.make_forward(model, True)
        criterion = steps_mod.make_criterion(cfg)

        @jax.jit
        def grads_of(params, stats, batch):
            images = steps_mod.batch_images(batch, True)
            target = batch["target"]

            def loss_fn(p):
                logits, _ = forward(p, stats, images, True, True)
                if loss_kind == "logits2":
                    return jnp.mean(logits.astype(jnp.float32) ** 2)
                return criterion(logits, target)

            return jax.value_and_grad(loss_fn)(params)

        loss, grads = grads_of(
            variables["params"], variables.get("batch_stats", {}), batch
        )
        flat = jax.tree_util.tree_flatten_with_path(jax.device_get(grads))[0]
        bad = [
            jax.tree_util.keystr(p)
            for p, leaf in flat
            if not np.isfinite(np.asarray(leaf, np.float32)).all()
        ]
        print(json.dumps({
            "variant": name, "loss": float(loss),
            "n_nonfinite_leaves": len(bad), "nonfinite": bad[:10],
        }), flush=True)
        packed_mod.BLOCK_BARRIER = False

    run_variant("base")
    run_variant("logits2", loss_kind="logits2")
    run_variant("barrier", barrier=True)
    run_variant("remat", remat=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
