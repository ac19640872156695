"""Bisect WHICH packed-block fence the XLA miscompile workaround needs.

probe4 established: the full-graph packed bf16 supervised step NaNs
modal2_block1's entire gradient on the real-CHAOS step-0 batch, and
fencing every PackedConvBlock output (BLOCK_BARRIER) cures it at a
bit-identical forward loss. The production default now pays that fence
on all three packed blocks (modal1_block1, modal2_block1, up_block4's
ConvBlock_0). This probe scopes the fence via packed.BLOCK_BARRIER_ONLY
to find the minimal set that still cures the 8 non-finite leaves:

  base        - no fence (expect 8 bad leaves; control)
  barrier_m2  - fence modal2_block1 only (the block whose grads NaN)
  barrier_enc - fence both encoder block1s
  barrier_up  - fence up_block4's inner block only
  barrier_all - fence everything (expect 0; control-cure)

Prints one JSON line per variant. Knowledge probe: the production knob
stays the all-blocks fence unless a narrower scope is both curing AND
measurably cheaper on the bench.

  python experiments/naive_nan_probe5.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import argparse

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

    import dataclasses

    base_cfg = L.build_cfg(
        "naive", "/tmp/naive_nan_probe5", 1,
        img_size=args.img_size, base_width=args.base_width,
    )
    # the ladder config enables the fence by default; this probe drives it
    # exclusively through the packed module globals
    base_cfg = dataclasses.replace(
        base_cfg,
        model=dataclasses.replace(base_cfg.model, packed_block_barrier=False),
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

    def run_variant(name, only):
        # only: None = no fence at all; set() unreachable; frozenset = scope
        packed_mod.BLOCK_BARRIER = only is not None
        packed_mod.BLOCK_BARRIER_ONLY = (
            None if only in (None, "all") else frozenset(only)
        )
        model = build_model(base_cfg.model)
        x = jnp.zeros((1, base_cfg.data.img_size, base_cfg.data.img_size, 3))
        variables = model.init(jax.random.key(base_cfg.seed), x, x, train=False)
        forward = steps_mod.make_forward(model, True)
        criterion = steps_mod.make_criterion(base_cfg)

        @jax.jit
        def grads_of(params, stats, batch):
            images = steps_mod.batch_images(batch, True)
            target = batch["target"]

            def loss_fn(p):
                logits, _ = forward(p, stats, images, True, True)
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
        packed_mod.BLOCK_BARRIER_ONLY = None

    run_variant("base", None)
    run_variant("barrier_m2", {"modal2_block1"})
    run_variant("barrier_enc", {"modal1_block1", "modal2_block1"})
    run_variant("barrier_up", {"ConvBlock_0"})
    run_variant("barrier_all", "all")
    return 0


if __name__ == "__main__":
    sys.exit(main())
