"""Localize the chip-only bf16+packed NaN (see naive_nan_probe.py).

Probe 1 isolated the blowup to {bf16 compute} x {packed execution} on the
real chip (bf16_plain and f32_packed both run the same data clean, and the
same bf16_packed program is clean on CPU). This probe recomputes step 0's
gradients OUTSIDE the donating train step and reports which parameter
leaves come back non-finite, localizing the layer / op family. It also
dumps per-leaf max|grad| for the finite ones nearest the blowup.

  python experiments/naive_nan_probe2.py [--steps N]

Prints one JSON line per inspected step.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/naive_nan_probe2")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    import chaos_real_ladder as L
    from aide_tpu.engine import steps as steps_mod
    from aide_tpu.engine.trainer import Trainer

    cfg = L.build_cfg("naive", args.workdir, 1)  # 256 px bf16 packed
    trainer = Trainer(cfg)
    pipe = trainer.train_pipe
    idxs = pipe.case_indices("10")
    pipe.targets[idxs] = L.shipped_pseudo_volume(pipe, "10")
    if pipe._device_data is not None:
        pipe.to_device(trainer.mesh, trainer.cfg.mesh.data_axis)

    forward = steps_mod.make_forward(trainer.model, trainer.two_modal)
    criterion = steps_mod.make_criterion(cfg)

    @jax.jit
    def grads_of(params, stats, batch):
        images = steps_mod.batch_images(batch, trainer.two_modal)
        target = batch["target"]

        def loss_fn(p):
            logits, _ = forward(p, stats, images, True, True)
            return criterion(logits, target)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss, grads

    shuffle_rng = np.random.default_rng(
        cfg.seed * 100003 + cfg.data.shuffle_seed * 1009 + 0
    )
    state = trainer.state
    for i, batch in enumerate(
        pipe.batches(cfg.data.batch_size, rng=shuffle_rng)
    ):
        if i >= args.steps:
            break
        loss, grads = grads_of(state.params, state.batch_stats, batch)
        flat = jax.tree_util.tree_flatten_with_path(jax.device_get(grads))[0]
        bad, peak = [], []
        for path, leaf in flat:
            a = np.asarray(leaf, np.float32)
            name = jax.tree_util.keystr(path)
            if not np.isfinite(a).all():
                bad.append({
                    "leaf": name, "size": int(a.size),
                    "n_nonfinite": int((~np.isfinite(a)).sum()),
                })
            else:
                peak.append((float(np.abs(a).max()), name))
        peak.sort(reverse=True)
        print(json.dumps({
            "step": i,
            "loss": float(loss),
            "nonfinite_grad_leaves": bad[:20],
            "n_nonfinite_leaves": len(bad),
            "top_finite_grad_mags": [
                {"leaf": n, "max_abs": round(m, 3)} for m, n in peak[:8]
            ],
        }), flush=True)
        # ALSO take the real (donating) train step so later steps see the
        # same params the production epoch would
        state, m = trainer.train_step(state, batch)
        print(json.dumps({"step": i, "train_step_loss": float(m["loss"])}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
