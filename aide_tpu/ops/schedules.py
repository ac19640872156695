"""Learning-rate schedules and optimizer construction.

Covers the reference's StepLR(step=30, gamma=0.5) / PolyLR(power=0.9)
epoch-level schedules (/root/reference/train_files/
trainchaos_proposed_30cases1labeled.py:235-240,
/root/reference/utils/poly_lr_scheduler.py:31-52) as optax step-count
schedules, plus the Adam(amsgrad) optimizer (:231-232).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from aide_tpu.core.config import OptimConfig


def make_lr_schedule(cfg: OptimConfig, steps_per_epoch: int, num_epochs: int):
    """Return an optax schedule over *optimizer steps* that changes once per
    epoch, exactly like the reference's per-epoch scheduler.step()."""
    spe = max(1, steps_per_epoch)

    if cfg.lr_policy == "StepLR":

        def schedule(count):
            epoch = count // spe
            return cfg.lr * (cfg.step_gamma ** (epoch // cfg.step_size))

    elif cfg.lr_policy == "PolyLR":

        def schedule(count):
            epoch = count // spe
            # The reference wraps with (epoch % max), snapping the LR back
            # to full base rate when training runs past the schedule length
            # (poly_lr_scheduler.py:47). Documented defect, not replicated:
            # clamp instead so the LR decays monotonically to 0 and stays.
            frac = jnp.maximum(0.0, 1.0 - epoch / float(num_epochs))
            return cfg.lr * (frac ** cfg.poly_power)

    elif cfg.lr_policy in ("None", "none", ""):

        def schedule(count):
            return cfg.lr

    else:
        raise ValueError(f"unknown lr_policy {cfg.lr_policy!r}")

    return schedule


def rate_schedule(epoch: int, warmup_epochs: int) -> float:
    """Co-teaching consistency ramp: min((e/warmup)^2, 1)
    (trainchaos_proposed_30cases1labeled.py:248)."""
    if warmup_epochs <= 0:
        return 1.0
    return min((float(epoch) / float(warmup_epochs)) ** 2, 1.0)


def make_optimizer(cfg: OptimConfig, steps_per_epoch: int, num_epochs: int):
    schedule = make_lr_schedule(cfg, steps_per_epoch, num_epochs)
    if cfg.optimizer == "amsgrad_adam":
        tx = optax.amsgrad(learning_rate=schedule)
    elif cfg.optimizer == "adam":
        tx = optax.adam(learning_rate=schedule)
    elif cfg.optimizer == "sgd":
        tx = optax.sgd(learning_rate=schedule, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    chain = []
    if cfg.grad_clip_norm:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.weight_decay:
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(tx)
    return optax.chain(*chain) if len(chain) > 1 else tx
