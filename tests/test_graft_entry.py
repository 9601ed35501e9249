"""Driver-contract tests: __graft_entry__ must keep compiling and running."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 201)
    assert bool(np.isfinite(np.asarray(out)).all())


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)   # asserts internally


def test_dryrun_multichip_odd():
    import __graft_entry__ as g

    g.dryrun_multichip(3)   # odd count → dict_shards falls back to 1
