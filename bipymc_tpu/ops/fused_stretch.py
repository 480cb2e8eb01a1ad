"""Fused multi-generation stretch-move chunk: G generations per kernel.

The affine-invariant stretch sampler (samplers/stretch.py, Goodman &
Weare 2010 red-black scheme) is as dispatch-bound as DREAM-zs was before
ops/fused_chunk.py — ~20 small XLA ops per generation around ~1µs of
math — but structurally SIMPLER to fuse: there is no archive (the
proposal pool is the live population itself) and no burn-in adaptation,
so an entire run is time-homogeneous and any number of generations can
execute as ONE kernel with the walker population (x, logp) carried in
VMEM scratch.

The only operation the per-generation engine does that Mosaic cannot do
directly is the complementary-walker gather ``x[j]`` with a traced
per-walker index. In-kernel it becomes a one-hot matmul: the whole
population lives in the kernel cell (this engine requires all walkers in
one chain block — enforced), so ``x_j = onehot(j) @ x`` is an
[n_p, n_p] × [n_p, d_p] MXU contraction (~17 MFLOP per half-update at
256 walkers — sub-µs — growing n² so the engine is capped at 1024
walkers; above that use the per-generation engine).

Division of labour per chunk (samplers/stretch_fused.py drives this):

- XLA (once per chunk): threefry bits for all G generations with the
  identical fold discipline as stretch.py's ``half_update`` (step_key on
  t, split, per-walker fold by global index), partner indices
  ``j = bits0 % half`` offset into the other half, the stretch factor
  ``z = ((a-1)u+1)²/a`` and ``log u`` conversions — the same expressions
  as the per-generation engine, so streams and scalar values are
  identical.
- Pallas (this kernel): for g = 0..G-1, the two sequential half-updates:
  one-hot partner gather, ``x* = x_j + z (x_i − x_j)``, the target
  log-density (inlined ``log_prob_block``), and the Goodman–Weare accept
  ``log u < (d−1) log z + logπ(x*) − logπ(x)`` masked to the active
  half. x and logp live in VMEM scratch; per-generation scalars stream
  in and history streams out through the pipelined grid.

Reference parity: execution strategy only — the algorithm is
samplers/stretch.py's, itself a beyond-reference extra (emcee v3
red-black parallelisation is the design precedent).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bipymc_tpu.ops.fused_chunk import hoist_target_consts
from bipymc_tpu.ops.tiling import round_up

_LANE = 128
MAX_WALKERS = 1024     # one-hot gather is n²; past this, per-gen engine

# scal lane assignments ([G, n, LANE] packed per-walker scalars):
# phase-1 (first half active): partner row, z, log u — then phase 2
S_J1, S_Z1, S_LU1, S_J2, S_Z2, S_LU2 = 0, 1, 2, 3, 4, 5


def _make_kernel(closed_fn, const_shapes, n_true, half, d_true):
    nc = len(const_shapes)

    def kernel(*refs):
        x0_ref, lp0_ref, scal_ref = refs[:3]
        const_refs = refs[3:3 + nc]
        xh_ref, aux_ref, x_scr, lp_scr = refs[3 + nc:]
        consts = [cref[:] if len(shape) >= 2 else cref[:].reshape(shape)
                  for cref, shape in zip(const_refs, const_shapes)]
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _init():
            x_scr[:] = x0_ref[:]
            lp_scr[:] = lp0_ref[:]

        x = x_scr[:]                               # [n_p, d_p]
        lp = lp_scr[:, 0:1]                        # [n_p, 1] lp dtype
        scal = scal_ref[0]                         # [n_p, LANE]
        n_p = x.shape[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (n_p, 1), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n_p, n_p), 1)
        d_f = jnp.asarray(d_true, x.dtype)
        acc_any = jnp.zeros((n_p, 1), lp.dtype)

        for jl, zl, ll, first in ((S_J1, S_Z1, S_LU1, True),
                                  (S_J2, S_Z2, S_LU2, False)):
            j = scal[:, jl:jl + 1].astype(jnp.int32)      # [n_p, 1]
            onehot = (col == j).astype(x.dtype)           # [n_p, n_p]
            x_j = jax.lax.dot(onehot, x)                  # MXU gather
            # scal rides in promote(dtype, f32) so indices are exact for
            # narrow walker dtypes; values were computed in the walker
            # dtype, so this downcast is an exact round trip
            z = scal[:, zl:zl + 1].astype(x.dtype)
            log_u = scal[:, ll:ll + 1].astype(x.dtype)
            x_star = x_j + z * (x - x_j)
            # lps/lp/log_alpha follow the TARGET's dtype (a bf16-walker
            # target usually promotes to f32) — the same promotion the
            # per-generation engine's accept math sees
            lps = closed_fn(x_star, *consts).astype(lp.dtype)  # [n_p, 1]
            log_alpha = (d_f - 1.0) * jnp.log(z) + lps - lp
            log_alpha = jnp.where(jnp.isfinite(lps),
                                  jnp.minimum(0.0, log_alpha),
                                  jnp.asarray(-jnp.inf, lp.dtype))
            active = ((row < half) if first
                      else (row >= half) & (row < n_true))
            acc = active & (log_u < log_alpha)
            x = jnp.where(acc, x_star, x)
            lp = jnp.where(acc, lps, lp)
            acc_any = jnp.maximum(acc_any, acc.astype(lp.dtype))

        x_scr[:] = x
        lp_scr[:] = jnp.broadcast_to(lp, lp_scr.shape)
        xh_ref[0] = x
        lane = jax.lax.broadcasted_iota(jnp.int32, lp_scr.shape, 1)
        aux_ref[0] = jnp.where(lane == 0, lp,
                               jnp.where(lane == 1, acc_any, 0.0))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("log_prob_block", "n_true", "half", "d_true",
                     "interpret"))
def fused_stretch_pallas(x0, logp0, scal, log_prob_block, n_true, half,
                         d_true, interpret=False):
    """Advance G stretch generations (2G half-updates) in one kernel.

    x0 [n, d]; logp0 [n]; scal [G, n, 6] packed per-walker scalars
    (j1, z1, log_u1, j2, z2, log_u2 — partner ROW indices are absolute
    walker rows, precomputed with the per-generation engine's exact bit
    conversions). scal must ride in a dtype that represents every row
    index exactly (the driver packs promote(x0.dtype, float32); z/log-u
    lanes are downcast to x0.dtype in-kernel — exact, since the driver
    computed them in x0.dtype). log_prob_block: hashable ``[n_p, Dp] -> [n_p, 1]`` on
    zero-padded lanes. Returns (x_hist [G, n, d], logp_hist [G, n],
    accepted [G, n] bool — either half-update accepted).
    """
    G, n, k = scal.shape
    if n != n_true:
        raise ValueError(f"scal walker axis {n} != n_true {n_true}")
    if n_true > MAX_WALKERS:
        raise ValueError(
            f"fused stretch engine supports <= {MAX_WALKERS} walkers "
            f"(one-hot partner gather is O(n^2)); got {n_true} — use "
            "the per-generation engine")
    dtype = x0.dtype
    lp_dtype = logp0.dtype         # the target's dtype (promotion kept:
    d = x0.shape[1]                # bf16 walkers usually carry f32 logp)
    n_p = round_up(n, 8)
    d_p = round_up(d, _LANE)

    x0_p = jnp.pad(x0, ((0, n_p - n), (0, d_p - d)))
    lp0_p = jnp.pad(jnp.broadcast_to(logp0[:, None], (n, _LANE)),
                    ((0, n_p - n), (0, 0)))
    scal_p = jnp.pad(scal, ((0, 0), (0, n_p - n), (0, _LANE - k)))

    closed_fn, consts_2d, const_shapes, const_specs = hoist_target_consts(
        log_prob_block, n_p, d_p, dtype)

    nd = pl.BlockSpec((1, n_p, d_p), lambda g_: (g_, 0, 0),
                      memory_space=pltpu.VMEM)
    nl = pl.BlockSpec((1, n_p, _LANE), lambda g_: (g_, 0, 0),
                      memory_space=pltpu.VMEM)
    xh, aux = pl.pallas_call(
        _make_kernel(closed_fn, const_shapes, n, half, d),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((n_p, d_p), lambda g_: (0, 0),
                         memory_space=pltpu.VMEM),            # x0
            pl.BlockSpec((n_p, _LANE), lambda g_: (0, 0),
                         memory_space=pltpu.VMEM),            # lp0
            nl,                                               # scal
        ] + list(const_specs),
        out_specs=[nd, nl],
        out_shape=[
            jax.ShapeDtypeStruct((G, n_p, d_p), dtype),
            jax.ShapeDtypeStruct((G, n_p, _LANE), lp_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_p, d_p), dtype),
            pltpu.VMEM((n_p, _LANE), lp_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x0_p, lp0_p, scal_p, *consts_2d)

    return xh[:, :n, :d], aux[:, :n, 0], aux[:, :n, 1] > 0.5
