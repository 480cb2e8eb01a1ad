"""Driver contract: __graft_entry__.entry / dryrun_multichip must work.

The round driver compile-checks entry() single-chip and executes
dryrun_multichip(N) on N virtual CPU devices; a regression here fails the
whole round's validation, so pin it in CI.
"""

import sys
import os

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    state, logp = jax.jit(fn)(*args)
    assert logp.shape == (256,)
    assert bool(jnp.all(jnp.isfinite(logp)))


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)   # conftest provides 8 fake CPU devices
