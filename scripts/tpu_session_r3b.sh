#!/bin/bash
# Follow-on to tpu_session_r3.sh: wait for it to finish (it holds no lock;
# detect via its completion line), then run the s15 relayout roofline in
# both precision modes.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
RES=docs/tpu_results

for _ in $(seq 1 720); do  # up to 6 h
  grep -q "r3 session complete" "$RES/r3_session.log" 2>/dev/null && break
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
  [ -s "$RES/$name.json" ] && { echo "stage $name: done, skipping"; return 0; }
  probe_alive || { echo "stage $name: tunnel dead — abort"; exit 1; }
  echo "=== stage $name (timeout ${tmo}s)  [$(date -Is)]"
  local out="$RES/$name.json.tmp"
  if timeout "$tmo" "$@" > "$out" 2> "$RES/$name.log" && [ -s "$out" ]; then
    mv "$out" "$RES/$name.json"; echo "stage $name: OK"; cat "$RES/$name.json"
  else
    echo "stage $name: FAILED — tail:"; tail -5 "$RES/$name.log"; rm -f "$out"
  fi
}

run_stage relayout 1500 python scripts/tpu_stages/s15_relayout_roofline.py
run_stage relayout_split4 1500 env ZAFTPU_PRECISION=split4 \
  python scripts/tpu_stages/s15_relayout_roofline.py
echo "r3b session complete"
