"""Driver-contract tests: __graft_entry__.entry and dryrun_multichip."""

import os
import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (64 * 64,)
    assert np.isfinite(out).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_bench_importable():
    import bench

    assert callable(bench.main)
    A, b = bench.build_problem()
    assert A.shape[0] == bench.GRID[0] * bench.GRID[1]
