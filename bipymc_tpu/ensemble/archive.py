"""Archive Z for DE-MC-z / DREAM-zs: a fixed-shape ring buffer.

ter Braak & Vrugt 2008 draw difference vectors from an archive of thinned
past states that *grows* over the run (SURVEY.md §4.6). XLA needs static
shapes, so Z is preallocated at capacity with a fill counter and a ring
head (SURVEY.md §9 "Archive Z growth vs static shapes"); early generations
sample only the filled prefix via :func:`sample_distinct` with the traced
fill count. Once wrapped, the ring overwrites oldest-first — every slot is
valid and uniform sampling over all slots is uniform over the retained
history.

The archive is *replicated* across shards in the distributed path by
default: appends go through an ``all_gather`` of the population so every
device applies the identical update (replacing the reference's MPI
``Bcast`` of Z, SURVEY.md §5.2).

When Z outgrows one device's memory budget (long runs × high d —
SURVEY.md §7.7's "long-history" scaling axis), the buffer can instead be
*sharded* block-wise over the chain mesh axis: global ring position ``p``
lives on shard ``p // cap_local`` at local slot ``p % cap_local`` — which
is exactly a leading-axis ``PartitionSpec`` over the same buffer, so the
replicated and sharded layouts share one ``Archive`` pytree. Sampling then
ring-passes the blocks around the mesh with ``ppermute``
(:func:`archive_gather_sharded`) — the ring-attention-shaped access
pattern SURVEY.md §7.7 calls for — and appends write only the slice of
new rows that lands in the local block (:func:`archive_append_sharded`).
Per-device archive memory drops from ``capacity·d`` to ``capacity·d/P``
at the cost of ``P−1`` ICI hops of one block per sampled generation.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from bipymc_tpu.ensemble.indices import sample_distinct


class Archive(NamedTuple):
    buf: jax.Array    # [capacity, d]
    fill: jax.Array   # [] int32 — number of valid rows
    head: jax.Array   # [] int32 — next write slot (ring)


def archive_init(init_rows, capacity: int) -> Archive:
    """Start the archive holding ``init_rows`` [k, d] (k ≤ capacity)."""
    init_rows = jnp.atleast_2d(init_rows)
    k, d = init_rows.shape
    if k > capacity:
        raise ValueError(f"init rows {k} exceed capacity {capacity}")
    buf = jnp.zeros((capacity, d), dtype=init_rows.dtype)
    buf = buf.at[:k].set(init_rows)
    return Archive(buf=buf,
                   fill=jnp.asarray(k, jnp.int32),
                   head=jnp.asarray(k % capacity, jnp.int32))


def archive_append(ar: Archive, rows) -> Archive:
    """Append [k, d] rows at the ring head (oldest rows overwritten)."""
    rows = jnp.atleast_2d(rows)
    k = rows.shape[0]
    capacity = ar.buf.shape[0]
    if k > capacity:
        # pos would wrap onto duplicate slots and the scatter winner is
        # implementation-defined — a silently corrupted archive
        raise ValueError(
            f"appending {k} rows to a capacity-{capacity} archive: "
            f"capacity must be ≥ the population size")
    pos = (ar.head + jnp.arange(k, dtype=jnp.int32)) % capacity
    buf = ar.buf.at[pos].set(rows)
    return Archive(buf=buf,
                   fill=jnp.minimum(ar.fill + k, capacity),
                   head=(ar.head + k) % capacity)


def archive_sample(ar: Archive, key, k: int):
    """Draw ``k`` distinct archive rows uniformly from the filled region.

    Valid slots are exactly [0, fill): before wraparound the prefix, after
    wraparound the whole buffer (fill == capacity). Returns [k, d].
    """
    idx = sample_distinct(key, k, ar.fill)
    return ar.buf[idx]


def archive_gather_sharded(buf_local, idx, axis_name):
    """Gather global ring positions ``idx`` from a block-sharded buffer.

    buf_local: [cap_local, d] — this shard's block of the global
        [P·cap_local, d] buffer (block layout: global position ``p`` is
        slot ``p % cap_local`` on shard ``p // cap_local``).
    idx: [..., k] int32 global positions (any batch shape).
    Returns [..., k, d] rows, identical to ``buf_global[idx]``.

    Runs a P-step ring: each step every shard masks-in the rows it needs
    from the block it currently holds, then ``ppermute``s the block to its
    neighbour. P−1 hops of one block total; the blocks return home as a
    side effect of the last (skipped) hop not being needed.
    """
    n_shards = lax.axis_size(axis_name)
    cap_local = buf_local.shape[0]
    me = lax.axis_index(axis_name)
    owner = idx // cap_local                     # [..., k]
    slot = idx % cap_local
    out = jnp.zeros(idx.shape + buf_local.shape[1:], buf_local.dtype)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    buf = buf_local
    for p in range(n_shards):
        # after p forward hops this shard holds the block born on me − p
        src = (me - p) % n_shards
        rows = buf[slot]                         # masked below if foreign
        out = jnp.where((owner == src)[..., None], rows, out)
        if p < n_shards - 1:
            buf = lax.ppermute(buf, axis_name, perm)
    return out


def archive_append_sharded(ar: Archive, rows, axis_name) -> Archive:
    """Ring append to a block-sharded buffer (``ar.buf`` is the local block).

    rows: [k, d] replicated new rows (the all_gathered population). Every
    shard computes the same global write positions and keeps only those
    landing in its own block; fill/head stay replicated scalars because
    every shard applies the identical update rule.
    """
    rows = jnp.atleast_2d(rows)
    k = rows.shape[0]
    n_shards = lax.axis_size(axis_name)
    cap_local = ar.buf.shape[0]
    capacity = cap_local * n_shards
    if k > capacity:
        raise ValueError(
            f"appending {k} rows to a global capacity-{capacity} sharded "
            f"archive: capacity must be ≥ the population size")
    me = lax.axis_index(axis_name)
    pos = (ar.head + jnp.arange(k, dtype=jnp.int32)) % capacity
    local = pos - me * cap_local
    # foreign rows get an out-of-range slot and are dropped by the scatter
    slot = jnp.where((local >= 0) & (local < cap_local), local, cap_local)
    buf = ar.buf.at[slot].set(rows, mode="drop")
    return Archive(buf=buf,
                   fill=jnp.minimum(ar.fill + k, capacity),
                   head=(ar.head + k) % capacity)
