"""Axis-optional collectives.

Ensemble generation steps are written once against these helpers; with
``axis_name=None`` they are identities (single-device ``vmap`` fast path),
with a mesh axis they lower to XLA ICI collectives under ``jax.shard_map``.
This pair of paths replaces the reference's mpi4py gather/Bcast/reduce
(SURVEY.md §3.2): there is no communicator object — the mesh axis is the
communicator.
"""

import jax
import jax.numpy as jnp
from jax import lax


def all_gather_chains(x, axis_name):
    """Gather the chain-sharded leading axis into the full population.

    [n_local, ...] -> [n_total, ...]; identity when axis_name is None.
    """
    if axis_name is None:
        return x
    return lax.all_gather(x, axis_name, axis=0, tiled=True)


def psum_chains(x, axis_name):
    """Sum a per-shard partial across the chain axis (identity if None)."""
    if axis_name is None:
        return x
    return lax.psum(x, axis_name)


def chain_offset(n_local, axis_name):
    """Global index of this shard's first chain (0 on the vmap path)."""
    if axis_name is None:
        return jnp.int32(0)
    return lax.axis_index(axis_name) * n_local


def axis_size(axis_name):
    """Number of shards along the chain axis (1 on the vmap path)."""
    if axis_name is None:
        return 1
    return lax.psum(1, axis_name)
