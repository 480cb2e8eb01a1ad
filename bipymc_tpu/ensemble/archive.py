"""Archive Z for DE-MC-z / DREAM-zs: a fixed-shape ring buffer.

ter Braak & Vrugt 2008 draw difference vectors from an archive of thinned
past states that *grows* over the run (SURVEY.md §4.6). XLA needs static
shapes, so Z is preallocated at capacity with a fill counter and a ring
head (SURVEY.md §9 "Archive Z growth vs static shapes"); early generations
sample only the filled prefix via :func:`sample_distinct` with the traced
fill count. Once wrapped, the ring overwrites oldest-first — every slot is
valid and uniform sampling over all slots is uniform over the retained
history.

The archive is *replicated* across shards in the distributed path: appends
go through an ``all_gather`` of the population so every device applies the
identical update (replacing the reference's MPI ``Bcast`` of Z,
SURVEY.md §5.2).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

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
