"""Stage 22: the 12-example figure pipeline on the REAL chip, f32
(VERDICT.md round 4 item 8).

The examples (examples/examples.py — the reference's 12 docstring/notebook
workflows, zaf.py docstrings + examples.ipynb) are the only end-to-end
exercise of the full public surface including the viz fetch paths, where
the round-3 complex-fetch poison hid. The CPU/f64 figure-stats gates run in
tests/test_examples.py every suite; this stage runs the same pipeline on
the TPU f32 fast path (float64 disabled -> all inputs arrive f32) and
gates each example's array fingerprints against the committed f64
expectations with f32-scale tolerances.

Tolerance classes:
  * shape: exact; finite_frac: exact.
  * residual arrays (expected rms < 1e-9 — the dct/dst/imdct
    reconstruction-error plots, ~1e-15 in f64): gate the f32 run's rms
    below 1e-4 — same "tiny in its precision class" meaning.
  * iterative/chaotic examples (griffin_lim): rel 0.5 on mean/rms only.
  * everything else: rel 5e-3 on mean/rms, 5e-2 on min/max (extrema of
    magnitude arrays sit near the f32 rounding floor), with an absolute
    floor scaled to the array's rms.

Prints ONE JSON line -> docs/tpu_results/examples_tpu.json.
"""

import json
import math
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

CHAOTIC = {"example_griffinlim"}
RESIDUAL_RMS_F64 = 1e-9
RESIDUAL_RMS_F32_MAX = 1e-4


def log(m):
    print(m, file=sys.stderr, flush=True)


def compare(name, exp, got):
    problems = []
    for arr, e in exp.items():
        g = got.get(arr)
        if g is None:
            problems.append(f"{arr}: missing")
            continue
        if g["shape"] != e["shape"]:
            problems.append(f"{arr}: shape {g['shape']} != {e['shape']}")
            continue
        if g["finite_frac"] != e["finite_frac"]:
            problems.append(f"{arr}: finite_frac {g['finite_frac']} != "
                            f"{e['finite_frac']}")
            continue
        if abs(e["rms"]) < RESIDUAL_RMS_F64:
            if abs(g["rms"]) > RESIDUAL_RMS_F32_MAX:
                problems.append(f"{arr}: residual rms {g['rms']:.3g} above "
                                f"the f32 class bound")
            continue
        if name in CHAOTIC:
            fields, rel = ("mean", "rms"), 0.5
        else:
            fields, rel = ("min", "max", "mean", "rms"), None
        for field in fields:
            r = rel if rel is not None else (
                5e-2 if field in ("min", "max") else 5e-3)
            floor = 1e-4 * max(1.0, abs(e["rms"]))
            if not math.isclose(g[field], e[field], rel_tol=r,
                                abs_tol=floor):
                problems.append(
                    f"{arr}.{field}: {g[field]!r} != {e[field]!r}")
    return problems


def main():
    import jax

    if (jax.default_backend() != "tpu"
            and os.environ.get("S22_ALLOW_CPU") != "1"):
        print(json.dumps({"ok": False, "reason": "not on TPU"}))
        return 1

    stats_path = os.path.join(REPO, "tests", "golden",
                              "example_stats.json")
    with open(stats_path) as fh:
        expected = json.load(fh)

    import matplotlib

    matplotlib.use("Agg")
    from examples import examples

    out = {"ok": True, "backend": jax.default_backend(), "examples": {}}
    with tempfile.TemporaryDirectory() as tmp:
        for fn in examples.ALL:
            name = fn.__name__
            try:
                got = examples.fingerprint(fn(tmp))
                problems = compare(name, expected[name], got)
                out["examples"][name] = {"ok": not problems,
                                         "problems": problems[:6]}
                if problems:
                    out["ok"] = False
                log(f"{name}: {'ok' if not problems else problems[:3]}")
            except Exception as exc:  # noqa: BLE001
                out["ok"] = False
                out["examples"][name] = {
                    "ok": False,
                    "problems": [f"{type(exc).__name__}: {exc}"[:300]]}
                log(f"{name}: FAILED {type(exc).__name__}: "
                    f"{str(exc)[:200]}")
    out["n_ok"] = sum(1 for v in out["examples"].values() if v["ok"])
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
