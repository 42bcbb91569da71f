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
  # MUST force a fresh compile: during the degraded-tunnel state cached
  # programs run while every new compile hits UNIMPLEMENTED (2026-08-19).
  timeout 90 python -c "
import time, jax, jax.numpy as jnp
k = int(time.time()) % 977 + 8
x = jnp.ones((8, k))
assert float(jnp.pad(x, ((0, 1), (1, 0)))[:8, 1:].sum()) == 8.0 * k
print(jax.devices())
" >/dev/null 2>&1
}
while true; do
  if probe; then
    echo "$(date -Is) tunnel ALIVE -> session" >> "$LOG"
    timeout 10800 bash scripts/tpu_session.sh >> "$LOG" 2>&1
    echo "$(date -Is) session done (rc=$?)" >> "$LOG"
    sleep 300
  else
    echo "$(date -Is) tunnel dead" >> "$LOG"
    sleep 150
  fi
done
