#!/bin/bash
# Third round-3 chain: after r3b, re-run the sharded-layer stages against
# the upgraded shard_map bodies (Pallas/fused kernel dispatch inside
# shard_map — commit e54ba78). The first shardmap_probe ran mid-edit and
# its transform cases must be superseded.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
RES=docs/tpu_results

for _ in $(seq 1 720); do
  grep -q "r3b session complete" "$RES/r3b_session.log" 2>/dev/null && break
  sleep 30
done

probe_alive() {
  timeout 90 python -c "
import time, jax, jax.numpy as jnp
k = int(time.time()) % 977 + 8
x = jnp.ones((8, k))
assert float(jnp.pad(x, ((0, 1), (1, 0)))[:8, 1:].sum()) == 8.0 * k
" >/dev/null 2>&1
}

run_stage() {
  local name="$1" tmo="$2"; shift 2
  probe_alive || { echo "stage $name: tunnel dead — abort"; exit 1; }
  echo "=== stage $name (timeout ${tmo}s)  [$(date -Is)]"
  local out="$RES/$name.json.tmp"
  if timeout "$tmo" "$@" > "$out" 2> "$RES/$name.log" && [ -s "$out" ]; then
    mv "$out" "$RES/$name.json"; echo "stage $name: OK"; cat "$RES/$name.json"
  else
    echo "stage $name: FAILED — tail:"; tail -5 "$RES/$name.log"; rm -f "$out"
  fi
}

run_stage sharded_tpu    1800 python scripts/tpu_stages/s13_sharded_tpu.py
run_stage shardmap_probe 2100 python scripts/tpu_stages/s14_shardmap_probe.py
echo "r3c session complete"
