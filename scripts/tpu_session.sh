#!/bin/bash
# One TPU hardware session: run each stage under its own timeout, skipping
# stages that already produced a result file. Delete a result file under
# docs/tpu_results/ to force a stage to rerun next session.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
# Persistent XLA compile cache for every stage (bench.py sets it in-process;
# stage workers pick it up from the env where the backend honors it).
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
RES=docs/tpu_results
mkdir -p "$RES"

probe_alive() {  # mid-session wedge detector: must do a FRESH compile.
  # A cached-op probe passes during the "degraded tunnel" state where every
  # NEW compile hits UNIMPLEMENTED (observed 2026-08-19: matmul from the
  # server cache ran while pad/concat/swapaxes of ones all failed). Vary a
  # shape by the clock so each probe forces an uncached compile.
  timeout 90 python -c "
import time, jax, jax.numpy as jnp
k = int(time.time()) % 977 + 8
x = jnp.ones((8, k))
assert float(jnp.pad(x, ((0, 1), (1, 0)))[:8, 1:].sum()) == 8.0 * k
" >/dev/null 2>&1
}

run_stage() {  # run_stage <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  if [ -s "$RES/$name.json" ]; then
    # A result whose TOP-LEVEL ok is false is not done — a stage may emit
    # JSON describing a mid-run tunnel wedge; retry those. Only the
    # top-level key counts: per-case {"ok": false} entries inside an
    # otherwise-successful probe result (e.g. fused_probe's known-failing
    # Mosaic cases) must NOT trigger a rerun every session.
    if ! python -c "import json,sys; d=json.load(open('$RES/$name.json')); sys.exit(0 if d.get('ok', True) else 1)" 2>/dev/null; then
      echo "stage $name: previous result has ok=false — rerunning"
      rm -f "$RES/$name.json"
    else
      echo "stage $name: already done, skipping"
      return 0
    fi
  fi
  # A wedge mid-session would make every remaining stage burn its full
  # timeout; probe before committing a budget (stays missing -> next session
  # retries).
  if ! probe_alive; then
    echo "stage $name: tunnel dead at stage start — skipping rest of session"
    exit 1
  fi
  echo "=== stage $name (timeout ${tmo}s): $*"
  local out="$RES/$name.json.tmp"
  if timeout "$tmo" "$@" > "$out" 2> "$RES/$name.log"; then
    if [ -s "$out" ]; then
      mv "$out" "$RES/$name.json"
      echo "stage $name: OK"
      cat "$RES/$name.json"
    else
      echo "stage $name: rc=0 but empty output"
      rm -f "$out"
    fi
  else
    echo "stage $name: FAILED (rc=$?) — tail of log:"
    tail -5 "$RES/$name.log"
    rm -f "$out"
    return 1
  fi
}

# Order: cheapest/most-informative first. A wedge mid-session only costs the
# remaining stages; completed results are kept.
run_stage diag       900  python scripts/tpu_stages/s0_diag.py
run_stage micro      420  python scripts/tpu_stages/s1_micro.py
run_stage bench      1500 env BENCH_REQUIRE_TPU=1 python bench.py
run_stage pallas_ab  1200 python scripts/tpu_stages/s3_pallas_ab.py
run_stage mfu        1200 python scripts/tpu_stages/s4_mfu.py
# Same roofline under the split4 dial (bench.py's headline rung): the 49
# TFLOP/s f32 peak IS the 4-pass scheme's equivalent peak (197/4), so this
# is the honest MXU-utilization number for the shipped configuration.
run_stage mfu_split4 1200 env ZAFTPU_PRECISION=split4 python scripts/tpu_stages/s4_mfu.py
run_stage mmfft32k   900  python scripts/tpu_stages/s5_matmulfft32k.py
run_stage bf16       900  python scripts/tpu_stages/s6_bf16.py
run_stage cqt_tune   3000 python scripts/tpu_stages/s7_cqt_tune.py
run_stage fused_probe 1800 python scripts/tpu_stages/s9_fused_probe.py
# Second-level fused bisect: which ingredient (1-D grid + dot, scratch +
# dot, DMA + dot) does the remote Mosaic reject? Health-gated per case.
run_stage fused_bisect 2400 python scripts/probes/probe_fused_bisect.py
run_stage stft_engines 4500 python scripts/tpu_stages/s8_stft_engines.py
run_stage stft_breakdown 1500 python scripts/tpu_stages/s11_stft_breakdown.py
# Bisect the shard_map UNIMPLEMENTED (s13 failed whole on 2026-08-20).
run_stage shardmap_probe 2100 python scripts/tpu_stages/s14_shardmap_probe.py
# The sharded layer on the real chip (VERDICT r2 item 2) — cheap, high value.
run_stage sharded_tpu 1800 python scripts/tpu_stages/s13_sharded_tpu.py
# default@600 + split4@600 (1200 s budgets) + hour@3600 (2400 s) + slack.
run_stage suite      5700 python scripts/tpu_stages/s10_suite.py
run_stage revgemm_probe 1200 python scripts/probes/probe_revgemm.py
run_stage mirror_probe 2100 python scripts/tpu_stages/s12_mirror_probe.py
echo "session complete"
