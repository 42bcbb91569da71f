"""Examples smoke tests + figure regression — the recreated reference
examples must run headless, and the arrays behind each figure must match
the committed statistical expectations (tests/golden/example_stats.json),
pinning the visual layer against the reference's golden images
(reference README.md:100,178,221)."""

import json
import math
import os
import sys

import matplotlib
import pytest

matplotlib.use("Agg")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import examples  # noqa: E402

STATS_PATH = os.path.join(os.path.dirname(__file__), "golden", "example_stats.json")


def test_example_melfilterbank(tmp_path):
    examples.example_melfilterbank(str(tmp_path))
    assert (tmp_path / "melfilterbank.png").stat().st_size > 0


def test_example_dct(tmp_path):
    examples.example_dct(str(tmp_path))
    assert (tmp_path / "dct.png").stat().st_size > 0


def test_example_imdct_without_fixture(tmp_path, monkeypatch):
    monkeypatch.setattr(examples, "FIXTURE", "/nonexistent.wav")
    examples.example_imdct(str(tmp_path))
    assert (tmp_path / "imdct.png").stat().st_size > 0


@pytest.fixture(scope="module")
def expected_stats():
    if not os.path.exists(examples.FIXTURE):
        pytest.skip("reference audio fixture missing — stats were made from it")
    if not os.path.exists(STATS_PATH):
        pytest.skip("example stats missing — run tests/make_example_stats.py")
    with open(STATS_PATH) as fh:
        return json.load(fh)


# Iterative examples amplify the ~1-ulp CPU threadpool nondeterminism
# (CLAUDE.md) chaotically: 50 Griffin-Lim projections turn it into ~1e-4
# relative drift in raw min/max (observed order-dependent in round 3), so the
# stats gate for them is widened far past the drift while staying tight
# enough to catch real regressions. Functional quality is gated separately in
# tests/test_griffinlim.py (spectral convergence < 0.08).
CHAOTIC_REL_TOL = {"example_griffinlim": 5e-2}


@pytest.mark.parametrize("fn", examples.ALL, ids=lambda f: f.__name__)
def test_example_figure_stats(fn, expected_stats, tmp_path):
    """Each example's plotted arrays match the committed fingerprint.

    Tolerances: shapes and finite fractions exact; value stats to 1e-5
    relative (CPU f64 executions are not bitwise run-to-run deterministic —
    see CLAUDE.md) with a small absolute floor for the near-zero
    residual arrays (dct diffs ~1e-15, imdct diff ~1e-14); chaotic
    iterative examples use CHAOTIC_REL_TOL."""
    exp = expected_stats[fn.__name__]
    got = examples.fingerprint(fn(str(tmp_path)))
    rel_tol = CHAOTIC_REL_TOL.get(fn.__name__, 1e-5)
    assert sorted(got) == sorted(exp)
    for name, e in exp.items():
        g = got[name]
        assert g["shape"] == e["shape"], f"{name}: shape {g['shape']} != {e['shape']}"
        assert g["finite_frac"] == e["finite_frac"], f"{name}: finite_frac changed"
        for field in ("min", "max", "mean", "rms"):
            assert math.isclose(
                g[field], e[field], rel_tol=rel_tol, abs_tol=1e-11
            ), f"{fn.__name__}/{name}.{field}: {g[field]!r} != {e[field]!r}"


def test_notebook_generated():
    nb = os.path.join(os.path.dirname(examples.__file__), "examples.ipynb")
    assert os.path.exists(nb)
    import json

    with open(nb) as fh:
        data = json.load(fh)
    assert len(data["cells"]) == 2 + 2 * len(examples.ALL)
