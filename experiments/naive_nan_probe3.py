"""Dissect modal2_block1's NaN (probe2: ALL its grads non-finite at step 0
while every other leaf is finite and small).

Reconstructs the exact block-1 computation OUTSIDE the model: the packed
input (pack(modal2)), Conv_0's struct_conv output (valid vs phantom slot
stats), the masked norm statistics (per-channel mean/var/mul), and the
gradients of the ISOLATED block on the same batch — for both modalities,
in bf16 and f32. Prints one JSON line per (modality, dtype).

  python experiments/naive_nan_probe3.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import numpy as np

    import jax
    import jax.numpy as jnp

    import chaos_real_ladder as L
    from aide_tpu.engine import steps as steps_mod
    from aide_tpu.engine.trainer import Trainer
    from aide_tpu.models.packed import (
        PackedConvBlock,
        _phase_mask,
        pack,
        struct_conv,
    )

    cfg = L.build_cfg("naive", "/tmp/naive_nan_probe3", 1)  # 256px bf16 packed
    trainer = Trainer(cfg)
    pipe = trainer.train_pipe
    idxs = pipe.case_indices("10")
    pipe.targets[idxs] = L.shipped_pseudo_volume(pipe, "10")
    if pipe._device_data is not None:
        pipe.to_device(trainer.mesh, trainer.cfg.mesh.data_axis)

    shuffle_rng = np.random.default_rng(
        cfg.seed * 100003 + cfg.data.shuffle_seed * 1009 + 0
    )
    batch = next(pipe.batches(cfg.data.batch_size, rng=shuffle_rng))
    images = steps_mod.batch_images(batch, trainer.two_modal)
    params = jax.device_get(trainer.state.params)
    H = W = cfg.data.img_size
    hb, wb = H // 2, W // 2
    mask = np.asarray(_phase_mask(hb + 1, wb + 1, 2, 2, -1, -1, H, W), np.float32)

    def stats(name, arr):
        a = np.asarray(arr, np.float32)
        return {
            f"{name}_finite": bool(np.isfinite(a).all()),
            f"{name}_absmax": float(np.abs(a[np.isfinite(a)]).max()) if np.isfinite(a).any() else None,
            f"{name}_n_nonfinite": int((~np.isfinite(a)).sum()),
        }

    for mi, mname in ((0, "modal1"), (1, "modal2")):
        for dt in ("bfloat16", "float32"):
            dtype = jnp.bfloat16 if dt == "bfloat16" else jnp.float32
            blk_params = params[f"{mname}_block1"]
            x5 = pack(images[mi].astype(dtype), 2, 2)
            k1 = jnp.asarray(blk_params["Conv_0"]["kernel"])
            b1 = jnp.asarray(blk_params["Conv_0"]["bias"])

            @jax.jit
            def conv0(x5):
                return struct_conv(
                    x5, k1, b1, (2, 2), (2, 2), (0, 0), (-1, -1),
                    (hb + 1, wb + 1), dtype,
                )

            y = jax.device_get(conv0(x5))
            y5 = np.asarray(y, np.float32).reshape(y.shape[:3] + (32, 4))
            m5 = mask  # (hb+1, wb+1, 1, 4)
            valid = y5 * m5
            phant = y5 * (1.0 - m5)
            cnt = float(4 * H * W)
            mean = valid.sum(axis=(0, 1, 2, 4)) / cnt
            var = (valid ** 2).sum(axis=(0, 1, 2, 4)) / cnt - mean ** 2
            row = {
                "modality": mname, "dtype": dt,
                **stats("x5", np.asarray(x5, np.float32)),
                **stats("conv0", y5),
                **stats("conv0_phantom", phant),
                "var_min": float(var.min()), "var_max": float(var.max()),
                "mean_absmax": float(np.abs(mean).max()),
            }

            # isolated block gradients on the same input
            block = PackedConvBlock(
                32, images[mi].shape[-1], H, W, norm="batch", groups=8,
                dtype=dtype,
            )
            variables = {
                "params": blk_params,
                "batch_stats": jax.device_get(trainer.state.batch_stats)[
                    f"{mname}_block1"
                ],
            }

            @jax.jit
            def gblock(p, x5):
                def loss(p):
                    out, _ = block.apply(
                        {"params": p, "batch_stats": variables["batch_stats"]},
                        x5, True, mutable=["batch_stats"],
                    )
                    return jnp.sum(out.astype(jnp.float32) ** 2)

                return jax.grad(loss)(p)

            g = jax.device_get(gblock(variables["params"], x5))
            bad = [
                jax.tree_util.keystr(pth)
                for pth, leaf in jax.tree_util.tree_flatten_with_path(g)[0]
                if not np.isfinite(np.asarray(leaf, np.float32)).all()
            ]
            row["isolated_grad_nonfinite_leaves"] = bad
            print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
