"""Examples smoke tests — the recreated reference examples must run
headless, with and without the reference audio fixture."""

import os
import sys

import matplotlib

matplotlib.use("Agg")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import examples  # noqa: E402


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


def test_notebook_generated():
    nb = os.path.join(os.path.dirname(examples.__file__), "examples.ipynb")
    assert os.path.exists(nb)
    import json

    with open(nb) as fh:
        data = json.load(fh)
    assert len(data["cells"]) == 2 + 2 * len(examples.ALL)
