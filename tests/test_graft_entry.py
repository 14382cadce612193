"""Protect the driver interface: entry() compiles, dryrun_multichip runs."""

import pytest
import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    loss, bpp = [float(x) for x in out]
    assert loss == loss and bpp > 0


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(min(8, jax.device_count()))
