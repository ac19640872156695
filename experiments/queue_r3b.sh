#!/bin/bash
# Round-3 TPU work queue: runs as soon as the tunnel heals.
# 1. bench revalidation at the CHAOS point (post review-fix numbers)
# 2. second anatomy seed of the flagship two-modal pseudo ladder
cd /root/repo

probe() {
  timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

echo "[queue] waiting for the TPU tunnel..."
until probe; do
  echo "[queue] tunnel still down $(date +%H:%M:%S)"
  sleep 120
done
echo "[queue] tunnel up $(date +%H:%M:%S)"

echo "[queue] === bench (chaos) ==="
timeout 3600 python -u bench.py 2>&1 | tail -3

echo "[queue] === 2-modal pseudo ladder, seed 23 ==="
timeout 14000 python -u experiments/synthetic_aide.py \
  --style xhard --protocol pseudo --two-modal --packed --model fuseunet \
  --img-size 128 --num-cases 30 --clean-cases 1 --slices-per-case 30 \
  --epochs 100 --pretrain-epochs 150 --seed 23 \
  --aide-override coteach.warmup_epochs=60 \
  --workdir /tmp/aide_2modal_seed23 \
  --out experiments/synthetic_aide_pseudo_2modal_seed23.json 2>&1 | \
  grep -E "stage|label_quality|pseudo_label" | tail -40
echo "[queue] done"
