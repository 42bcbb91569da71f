#!/bin/bash
# TPU tunnel watcher: probe aliveness, run the staged hardware session when
# the tunnel is up. Safe to leave running for hours; all state under
# docs/tpu_results/. Never kills by pattern — every job runs under `timeout`.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p docs/tpu_results
# Single-instance lock: two watchers racing the tunnel wedges it (observed
# 2026-08-17: duplicate s6_bf16 stages at 12:09+12:11 -> UNIMPLEMENTED storm).
exec 9> docs/tpu_results/watch.lock
flock -n 9 || { echo "another watcher holds the lock; exiting"; exit 0; }
LOG=docs/tpu_results/watch.log
probe() {
  timeout 90 python -c \
    "import jax, jax.numpy as jnp; assert float((jnp.ones((8,8))*2).sum())==128.0; print(jax.devices())" \
    >/dev/null 2>&1
}
while true; do
  if probe; then
    echo "$(date -Is) tunnel ALIVE -> session" >> "$LOG"
    timeout 5400 bash scripts/tpu_session.sh >> "$LOG" 2>&1
    echo "$(date -Is) session done (rc=$?)" >> "$LOG"
    sleep 300
  else
    echo "$(date -Is) tunnel dead" >> "$LOG"
    sleep 150
  fi
done
