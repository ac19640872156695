"""Find an epoch-gate operating point where BOTH co-teaching nets are
GT-alive (testcase_dice > 0.05) after few epochs, so __graft_entry__'s
multichip gate can assert semantic health on a GT-scored metric.

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python experiments/dryrun_health_probe.py [lr] [epochs] [noise] [seed]
"""

import os
import sys
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/aide_dryrun_probe_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from aide_tpu.core.config import ModelConfig, TrainConfig
from aide_tpu.data.tasks.synthetic import SyntheticTask
from aide_tpu.engine.trainer import Trainer


def run(lr, epochs, noise, seed, ndev, cfg_seed=2):
    n_devices = 8
    b = 2 * n_devices
    tmp = tempfile.mkdtemp()
    ecfg = TrainConfig()
    ecfg.model = ModelConfig(name="unet2", compute_dtype="float32", norm="batch")
    ecfg.data.task = "synthetic"
    ecfg.data.variant = "proposed"
    ecfg.data.img_size = 16
    ecfg.data.batch_size = b
    ecfg.data.eval_batch_size = b
    ecfg.data.num_tta_views = 2
    ecfg.data.rotation_degree = 20.0
    ecfg.coteach.warmup_epochs = 2
    ecfg.num_epochs = epochs
    ecfg.optim.lr = lr
    ecfg.seed = cfg_seed
    ecfg.mesh.num_devices = ndev
    ecfg.checkpoint_dir = os.path.join(tmp, "ckpt")
    ecfg.history_dir = os.path.join(tmp, "hist")
    task = SyntheticTask(
        root=os.path.join(tmp, "synth"),
        tempmask_folder="tempmasks",
        num_cases=4,
        num_test_cases=3,
        slices_per_case=2 * n_devices + 1,
        size=16,
        noisy_fraction=noise,
        seed=seed,
    )
    tr = Trainer(ecfg, task=task)
    hist = tr.run(epochs)
    last = hist[-1]
    print(
        f"lr={lr} epochs={epochs} noise={noise} seed={seed} ndev={ndev}: "
        f"testcase_dice1={last['testcase_dice1']:.3f} "
        f"testcase_dice2={last['testcase_dice2']:.3f} "
        f"traincase_dice1={last['traincase_dice1']:.3f} "
        f"traincase_dice2={last['traincase_dice2']:.3f}"
    )
    return hist


if __name__ == "__main__":
    lr = float(sys.argv[1]) if len(sys.argv) > 1 else 1e-3
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    noise = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    ndev = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    cfg_seed = int(sys.argv[6]) if len(sys.argv) > 6 else 2
    run(lr, epochs, noise, seed, ndev, cfg_seed)
