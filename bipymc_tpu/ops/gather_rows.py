"""Capacity-independent archive row gather (HBM -> VMEM DMA kernel).

Built on the conjecture that XLA lowers ``archive.buf[row_idx]`` to a
one-hot ``dot`` whose cost scales with the archive *capacity*. The
hardware A/B (docs/ROUND3.md §14, benchmarks/profile_gather_mode.py)
REFUTED that: XLA's gather measured capacity-independent (~152 µs for
15k rows at both 8192 and 65536 rows), while this kernel is
latency-bound at ~25 ns/row (scattered 400-byte DMAs) — 2.5× slower.
The ``run_mcmc_until`` slowdown that motivated it was the carried-ring
size in the until-while_loop, fixed by capping the API's auto archive
capacity. The kernel ships OFF-default as a recorded negative (like
ops/pallas_chol.py) so the measurement stays reproducible.

Mechanics: the buffer stays in HBM (``memory_space=ANY``), the
flattened row indices ride scalar prefetch so they are available before
the body runs, and each grid cell issues ``rows_per_cell`` independent
async DMAs — one ``[1, d]`` row each, HBM -> the cell's VMEM output
block — then waits for them all. Cost is ``R`` row-sized DMAs
regardless of capacity; Mosaic double-buffers the output blocks so
cells overlap.

Exact by construction (a copy is a copy): equivalence with ``buf[idx]``
is pinned in interpret mode and on hardware (tests/test_gather_rows.py).
Reference parity: this implements the archive-row fetch of ter Braak &
Vrugt (2008)'s DREAM-zs sampled-history proposal (SURVEY.md §4.5); the
reference's NumPy fancy-indexing has no capacity pathology to begin
with, and neither should we.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, buf_ref, out_ref, sems, *, g):
    i = pl.program_id(0)
    copies = []
    for j in range(g):
        row = idx_ref[i * g + j]
        c = pltpu.make_async_copy(
            buf_ref.at[pl.ds(row, 1), :],
            out_ref.at[pl.ds(j, 1), :],
            sems.at[j])
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()


@functools.partial(jax.jit,
                   static_argnames=("rows_per_cell", "interpret"))
def gather_rows_pallas(buf, row_idx, *, rows_per_cell: int = 32,
                       interpret: bool = False):
    """``buf[row_idx]`` with cost independent of ``buf.shape[0]``.

    buf: [capacity, d]; row_idx: any int shape [...]; returns [..., d].
    rows_per_cell bounds the DMAs in flight per grid cell (each needs a
    semaphore); the row count is padded up to a multiple with repeats of
    row 0 and the padding rows are dropped from the result.
    """
    cap, d = buf.shape
    shape = row_idx.shape
    flat = row_idx.reshape(-1).astype(jnp.int32)
    r = flat.shape[0]
    if r == 0:                      # zero-length grid is not expressible
        return jnp.zeros((*shape, d), buf.dtype)
    # the HBM-side row slice must be tile-aligned in the minor dim
    # (Mosaic: "Slice shape along dimension 1 must be aligned to tiling
    # (128)") — lane-pad the buffer when d is ragged. One [cap, d_pad]
    # copy per call; callers amortising over a chunk (fused engine: one
    # gather per archive_thin generations) still come out ahead, and
    # the A/B (benchmarks/profile_gather_mode.py) prices it.
    d_true = d
    if d % 128:                     # minor-dim tiling is 128 lanes
        d = -(-d // 128) * 128
        buf = jnp.pad(buf, ((0, 0), (0, d - d_true)))
    # XLA's gather clamps out-of-range indices; the row DMA would read
    # whatever HBM sits past the buffer — clamp for identical semantics
    flat = jnp.clip(flat, 0, cap - 1)
    g = max(1, min(rows_per_cell, r))
    rp = -(-r // g) * g
    if rp != r:
        flat = jnp.pad(flat, (0, rp - r))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rp // g,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((g, d), lambda i, idx_ref: (i, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((g,))],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, g=g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rp, d), buf.dtype),
        interpret=interpret,
    )(flat, buf)
    return out[:r, :d_true].reshape(*shape, d_true)
