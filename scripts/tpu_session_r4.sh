#!/bin/sh
# Round-4 TPU measurement session. Waits out degraded-tunnel windows (new
# non-tiny compiles hang while tiny ones pass), then runs the full stage
# queue. Each stage writes docs/tpu_results/*.json + .log.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
R=docs/tpu_results

probe() {
    timeout 150 python - <<'EOF' > /dev/null 2>&1
import numpy as np, zaftpu
from zaftpu.core.windows import hamming
from zaftpu.utils.profiling import fetch_sync
import time
x = np.random.default_rng(int(time.time())).standard_normal(44100*23).astype(np.float32)
spec = zaftpu.stft(x, hamming(2048).astype(np.float32), 1024)
fetch_sync(spec)
EOF
}

echo "waiting for tunnel (23-s fresh-compile probe)..." >&2
tries=0
until probe; do
    tries=$((tries+1))
    if [ "$tries" -ge 40 ]; then
        echo "tunnel never recovered after $tries probes" >&2
        exit 1
    fi
    echo "probe $tries failed; retrying in 180 s" >&2
    sleep 180
done
echo "tunnel healthy after $tries retries" >&2

# 1. verify-equivalent TPU flow (fixture-scale SNRs + sharded parity).
timeout 900 python - <<'EOF' > $R/verify_r4.log 2>&1
import time
import numpy as np, jax, zaftpu
from zaftpu.core.windows import hamming, vorbis
print("devices:", jax.devices(), flush=True)
x, sr = zaftpu.wavread("/root/reference/audio_file.wav")
mono = x.mean(axis=1).astype(np.float32)
win = hamming(2048).astype(np.float32); step = 1024
spec = zaftpu.stft(mono, win, step)
rec = np.asarray(zaftpu.istft(spec, win, step))
n = min(len(mono), len(rec)); err = rec[:n]-mono[:n]
print("ISTFT SNR %.1f dB (expect >130)" % (10*np.log10((mono[:n]**2).sum()/(err**2).sum())), flush=True)
wv = vorbis(2048).astype(np.float32)
rec2 = np.asarray(zaftpu.imdct(zaftpu.mdct(mono, wv), wv))[:len(mono)]
err = rec2 - mono[:len(rec2)]
print("MDCT SNR %.1f dB (expect >100)" % (10*np.log10((mono**2).sum()/(err**2).sum())), flush=True)
c = zaftpu.cqtkernel(sr, 24, 55.0, 3520.0)
s0 = zaftpu.cqtspectrogram(mono, sr, 25, c); np.asarray(s0)
t0 = time.perf_counter(); np.asarray(zaftpu.cqtspectrogram(mono, sr, 25, c))
print("CQT warm: %.3f s" % (time.perf_counter()-t0), flush=True)
from zaftpu.sharding import make_mesh, stft_sharded, istft_sharded, mdct_sharded, imdct_sharded
mesh = make_mesh(1)
sp = stft_sharded(mono, win, step, mesh)
e1 = np.abs(np.asarray(jax.numpy.real(sp)) - np.asarray(jax.numpy.real(spec))).max()
e1i = np.abs(np.asarray(jax.numpy.imag(sp)) - np.asarray(jax.numpy.imag(spec))).max()
rec_s = np.asarray(istft_sharded(sp, win, step, mesh))
e2 = np.abs(rec_s - rec).max()
co = mdct_sharded(mono, wv, mesh)
rec3 = np.asarray(imdct_sharded(co, wv, mesh))
e3 = np.abs(rec3 - rec2[:len(rec3)]).max()
print(f"sharded parity: stft {max(e1, e1i):.2e} istft {e2:.2e} imdct-chain {e3:.2e}", flush=True)
print("VERIFY DONE", flush=True)
EOF
tail -6 $R/verify_r4.log >&2

# 2. fused slab-CQT kernel on hardware.
timeout 1500 python scripts/tpu_stages/s21_cqt_slab_kernel.py > $R/cqt_slab.json 2> $R/cqt_slab.log
tail -2 $R/cqt_slab.log >&2

# 3. sharded breakdown at gate scale and amortized scale.
timeout 1200 python scripts/tpu_stages/s18_sharded_breakdown.py > $R/sharded_breakdown.json 2> $R/sharded_breakdown.log
S18_SECONDS=600 timeout 1500 python scripts/tpu_stages/s18_sharded_breakdown.py > $R/sharded_breakdown_600.json 2> $R/sharded_breakdown_600.log

# 4. the s13 sharded gate artifact (sharded_tpu.json).
timeout 1200 python scripts/tpu_stages/s13_sharded_tpu.py > $R/sharded_tpu.json 2> $R/sharded_tpu.log
tail -2 $R/sharded_tpu.log >&2

# 5. per-transform suite refresh (default/split4 600-s arms + hour arm).
timeout 3000 python scripts/tpu_stages/s10_suite.py > $R/suite.json 2> $R/suite.log

# 6. headline bench rehearsal.
timeout 1700 python bench.py > $R/bench_r4b.json 2> $R/bench_r4b.log
cat $R/bench_r4b.json >&2
echo "SESSION DONE" >&2
