"""Stage 23: attribute the DST-II vs DCT-II batch-GEMM gap (VERDICT.md
round 4 item 4).

suite.json round 4 recorded dst2_batch1024 at 1.57M frames/s vs
dct2_batch1024 at 2.19M under BOTH precision dials — yet the two are
same-shape (1024, 1024) @ (1024, 1024) direct-matrix GEMMs with symmetric
math (zaf.py:918-934 vs zaf.py:780-796), differing only in the operator's
VALUES. Hypotheses probed here, each arm in the same process with
amortized timing (reps over back-to-back dispatch blocks):

  a. measurement order (the harness always times dct2 first);
  b. per-transform program difference (time both, both orders, repeated);
  c. the raw GEMM outside the transform wrapper (jnp.matmul with the same
     trace-constant operator at HIGHEST) — isolates the wrapper;
  d. types III (the transposed operators) for contrast.

Prints ONE JSON line -> docs/tpu_results/dst_gap.json.
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    if (jax.default_backend() != "tpu"
            and os.environ.get("S23_ALLOW_CPU") != "1"):
        print(json.dumps({"ok": False, "reason": "not on TPU"}))
        return 1

    import zaftpu
    from zaftpu.transforms.dct import _direct_matrix
    from zaftpu.utils.profiling import timed

    n, b = 1024, 1024
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))

    def t(name, fn, *args):
        _, stats = timed(name, fn, *args, reps=3, dispatches=16,
                         target_s=2.0, log=False)
        fps = b / stats.seconds
        log(f"{name}: {stats.seconds * 1e3:.3f} ms -> {fps:,.0f} frames/s")
        return round(fps, 1)

    out = {"ok": True, "shape": [b, n]}

    # Arm b/a: both transforms, suite order then swapped, then repeats.
    out["dct2_first"] = t("dct2#1", lambda x: zaftpu.dct(x, 2), batch)
    out["dst2_second"] = t("dst2#1", lambda x: zaftpu.dst(x, 2), batch)
    out["dst2_again"] = t("dst2#2", lambda x: zaftpu.dst(x, 2), batch)
    out["dct2_again"] = t("dct2#2", lambda x: zaftpu.dct(x, 2), batch)

    # Arm c: raw trace-constant GEMMs at HIGHEST, outside the wrapper.
    mc = _direct_matrix("dct", 2, n).astype(np.float32)
    ms = _direct_matrix("dst", 2, n).astype(np.float32)

    def raw(mat):
        matc = jnp.asarray(mat)

        @jax.jit
        def f(x):
            return jnp.matmul(x, matc, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)

        return f

    out["raw_dct2"] = t("raw dct2", raw(mc), batch)
    out["raw_dst2"] = t("raw dst2", raw(ms), batch)
    # Identical-value control: the same matrix twice — any spread between
    # these two is pure measurement noise, not values.
    out["raw_dct2_control"] = t("raw dct2 ctrl", raw(mc.copy()), batch)

    # Arm d: the transposed operators (types III).
    out["dct3"] = t("dct3", lambda x: zaftpu.dct(x, 3), batch)
    out["dst3"] = t("dst3", lambda x: zaftpu.dst(x, 3), batch)

    gap = out["dst2_again"] / max(out["dct2_again"], 1.0)
    out["dst2_over_dct2_warm"] = round(gap, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
