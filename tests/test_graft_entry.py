"""Driver-hook regression guards: entry() compiles, dryrun_multichip runs
on the virtual 8-device mesh."""
import sys

import jax
import pytest


def test_entry_compiles():
    sys.path.insert(0, ".")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 1000)


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    sys.path.insert(0, ".")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
