"""The driver entry points must stay importable and runnable.

entry() is compile-checked single-chip by the driver; dryrun_multichip(N)
jits the full DP train step over an N-device mesh. Here we exercise both on
the CPU 8-device test mesh (conftest) so regressions in the flagship model
or the sharded step surface before the driver runs them.
"""

import sys
import os

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __graft_entry__ as ge  # noqa: E402


def test_entry_forward_jits():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 1 and np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)
