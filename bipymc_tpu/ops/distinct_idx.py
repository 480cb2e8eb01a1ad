"""Fused Pallas kernel for per-chain distinct-index draws.

The DREAM/DE-MC proposal needs k distinct archive/population row indices
per chain per generation (SURVEY.md §4.5–4.7). The exact sequential shift
construction (`ensemble/indices.distinct_from_bits`) is ~60 tiny dependent
integer ops; under `vmap` inside the generation scan XLA emits them as a
chain of separate kernels, which measured at **half the whole DREAM-zs
step** on v5e (~36µs/gen of ~70 at 256 chains × 100 dims, k=6). This
kernel runs the identical i32 algorithm in ONE VPU launch: chains ride the
(sublane, lane) grid, the k draws and the sorted-insert bookkeeping are
fully unrolled, `taken` lives in registers.

Bit-identical to the jnp reference path by construction (same masked
31-bit words, same i32 remainder, same shift/insert order) — equivalence
is tested in interpret mode and on hardware (tests/test_distinct_idx.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bipymc_tpu.ops.tiling import round_up

_SENTINEL = 2 ** 31 - 1
_LANE = 128
_SUB = 8                      # int32 tile: (8, 128)



def _make_kernel(k, m, has_exclude):
    def kernel(avail_ref, bits_ref, *rest):
        # rest = (excl_ref, out_ref) if has_exclude else (out_ref,)
        out_ref = rest[-1]
        shape = bits_ref.shape[1:]                   # [S, L] chains
        avail = avail_ref[0, 0]                      # already n − n_excl
        taken = [jnp.full(shape, _SENTINEL, jnp.int32) for _ in range(m)]
        if has_exclude:
            taken[0] = rest[0][:]
        for t in range(k):
            r = bits_ref[t] % (avail - t)
            # shift past taken values (sorted ascending; sentinels tail)
            for j in range(m):
                r = r + (r >= taken[j]).astype(jnp.int32)
            out_ref[t] = r
            # branchless insert of r into the sorted register file
            pos = jnp.zeros(shape, jnp.int32)
            for j in range(m):
                pos = pos + (taken[j] < r).astype(jnp.int32)
            new_taken = []
            for j in range(m):
                prev = taken[j - 1] if j > 0 else taken[0]
                new_taken.append(
                    jnp.where(jnp.int32(j) < pos, taken[j],
                              jnp.where(jnp.int32(j) == pos, r, prev)))
            taken = new_taken

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k", "interpret"))
def distinct_idx_pallas(bits, k, n, exclude=None, interpret=False):
    """k distinct ints per chain, uniform on [0, n) (optionally ≠ exclude).

    bits: [n_chains, k] uint32 words (from the generation's bits block).
    n: scalar int32, may be traced (archive fill / population size).
    exclude: optional [n_chains] int32 — per-chain excluded index.
    Returns int32 [n_chains, k], bit-identical to
    ``vmap(distinct_from_bits)`` (ensemble/indices.py).
    """
    n_chains = bits.shape[0]
    m = k + (1 if exclude is not None else 0)
    n_excl = 1 if exclude is not None else 0

    # chains → (sublane, lane) tiles; k is the (static-indexed) major axis
    n_pad = round_up(n_chains, _SUB * _LANE)
    s = n_pad // _LANE
    b31 = (bits & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    b31 = jnp.pad(b31, ((0, n_pad - n_chains), (0, 0)))
    b31 = b31.T.reshape(k, s, _LANE)
    avail = jnp.asarray(n, jnp.int32).reshape(1, 1) - n_excl

    args = [avail, b31]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    if exclude is not None:
        ex = jnp.pad(jnp.asarray(exclude, jnp.int32),
                     (0, n_pad - n_chains)).reshape(s, _LANE)
        args.append(ex)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        _make_kernel(k, m, exclude is not None),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, s, _LANE), jnp.int32),
        interpret=interpret,
    )(*args)
    return out.reshape(k, n_pad).T[:n_chains]
