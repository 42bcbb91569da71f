"""Driver entry points must keep working (compile check + multichip dryrun)."""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __graft_entry__ as graft  # noqa: E402


def test_entry_jittable():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert set(out) == {"spectrogram", "mfcc", "mdct", "cqt"}
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_entry_second_call_consistent():
    fn, args = graft.entry()
    a = jax.jit(fn)(*args)
    b = jax.jit(fn)(*args)
    np.testing.assert_array_equal(np.asarray(a["mfcc"]), np.asarray(b["mfcc"]))


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    graft.dryrun_multichip(5)
