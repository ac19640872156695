#!/bin/bash
# Round-4 TPU work spool: consumes experiments/q5/*.job serially (sorted by
# name), writing each job's output next to it as <name>.log. Jobs are plain
# bash snippets; drop new ones in while the runner lives. The runner probes
# the tunnel before each job (it drops for hours — CLAUDE.md) and survives
# tool timeouts because it is launched detached via nohup:
#   nohup bash experiments/queue_r4.sh >/tmp/q5.log 2>&1 & echo $! >/tmp/q5.pid
# Stop with: touch experiments/q5/STOP (takes effect between jobs).
cd /root/repo || exit 1
mkdir -p experiments/q5/done

probe() { timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

while :; do
  [ -f experiments/q5/STOP ] && { echo "[q5] STOP"; exit 0; }
  job=$(ls experiments/q5/*.job 2>/dev/null | sort | head -1)
  if [ -z "$job" ]; then sleep 60; continue; fi
  until probe; do
    echo "[q5] tunnel down $(date +%H:%M:%S)"
    sleep 120
    [ -f experiments/q5/STOP ] && { echo "[q5] STOP"; exit 0; }
  done
  echo "[q5] === $job start $(date +%H:%M:%S) ==="
  bash "$job" >"${job%.job}.log" 2>&1
  echo "[q5] === $job rc=$? end $(date +%H:%M:%S) ==="
  mv "$job" experiments/q5/done/
done
