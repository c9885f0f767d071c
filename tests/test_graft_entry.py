"""The driver entry points must stay runnable (the driver invokes them)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)


def test_entry_shapes():
    fn, args = graft.entry()
    # lower-only (no execution): validates tracability of the flagship step
    import jax

    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None
