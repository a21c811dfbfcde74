"""The driver entry points must compile and run on the CPU mesh."""

import jax
import numpy as np

import __graft_entry__ as ge


def test_entry_jits():
    fn, args = ge.entry()
    out = np.asarray(jax.jit(fn)(*args))
    assert out.shape == args[0].shape
    assert (out >= 0).all()
    # present k-mers (first half of the example batch) mostly resolve
    assert (out[:512] > 0).mean() > 0.9


def test_dryrun_multichip():
    ge.dryrun_multichip(8)
