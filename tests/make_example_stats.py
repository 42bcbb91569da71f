"""Regenerate tests/golden/example_stats.json — the statistical expectations
for the 13 recreated example figures (the reference's 12 + Griffin-Lim).

The reference treats images/*.png as its expected outputs (reference
README.md:100,178,221); since pixel-level comparison is brittle, we gate the
*arrays behind the figures* instead: shape, finite fraction, min/max, mean,
RMS per plotted matrix. Run under the same config as the test suite
(CPU, float64):

    python tests/make_example_stats.py
"""

import json
import os
import sys
import tempfile

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("ZAFTPU_BUCKET_FRAMES", "4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import examples  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "golden", "example_stats.json")


def main():
    if not os.path.exists(examples.FIXTURE):
        raise SystemExit(f"reference fixture missing: {examples.FIXTURE}")
    stats = {}
    with tempfile.TemporaryDirectory() as tmp:
        for fn in examples.ALL:
            print(f"fingerprinting {fn.__name__} ...", flush=True)
            outs = fn(tmp)
            stats[fn.__name__] = examples.fingerprint(outs)
    with open(OUT, "w") as fh:
        json.dump(stats, fh, indent=1, sort_keys=True)
    n = sum(len(v) for v in stats.values())
    print(f"wrote {OUT}: {len(stats)} examples, {n} arrays")


if __name__ == "__main__":
    main()
