"""Fused multi-step random-walk (MH/DR/DRAM) chunk: K steps in ONE kernel.

The single-chain DRAM hot loop (SURVEY.md §5.1; reference ``Dram.run_mcmc``
Python loop) is the most dispatch-bound path in the framework: per step the
useful math is ~1µs of VPU work behind a full launch round-trip, and unlike
the ensemble samplers there is no batch axis to amortise it. This module
applies the fused-chunk treatment proven on DREAM-zs (ops/fused_chunk.py):
one ``pallas_call`` advances K steps with (theta, logp) carried in VMEM
scratch across a sequential grid.

What makes the RW family fusable — division of labour per chunk:

- The stage-1 proposal Cholesky is CONSTANT between AM refresh points
  (samplers/rw.py refreshes at ``(t+1) % adapt_interval == 0``), so with
  K = adapt_interval and chunk starts aligned to refresh boundaries the
  trajectory inside a chunk depends only on (theta, logp) and
  pregenerated randomness. The Welford mean/scatter updates do NOT feed
  back within the chunk — samplers/rw_fused.py replays them bit-exactly
  from the chunk history afterwards and applies the refresh at the
  boundary.
- XLA (once per chunk): the exact per-step bits stream of
  samplers/rw.py's ``_default_draws`` (one [2d+2]-word block per
  (step, chain)), the proposal displacements ``dy1 = L z1`` and
  ``dy2 = (L/√κ) z2`` (batched matmuls against the frozen factor), and
  the whitened norms ‖z₁‖², ‖z₁ − z₂/√κ‖² that the Green–Mira ratio
  needs (samplers/rw.py's no-triangular-solve trick — they are functions
  of the raw draws only).
- Pallas (this kernel), per step: y₁ = θ + dy₁, the target log-density
  (inlined ``log_prob_block``), and for DR the second stage y₂ = θ + dy₂
  with the exact Green–Mira acceptance on packed scalars; Metropolis
  select; history out.

Trajectories are bit-identical in randomness to the per-step engine and
match to float re-association in math (tests/test_fused_rw.py pins exact
stream/selection agreement in interpret mode).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# the SAME log1mexp the per-step engine uses: elementwise jnp only, so
# it traces inside the Mosaic kernel body, and a numerical tweak cannot
# desynchronise the two engines' Green–Mira acceptance
# (tests/test_fused_rw.py pins the agreement)
from bipymc_tpu.core.numerics import log1mexp as _log1mexp
from bipymc_tpu.ops.fused_chunk import hoist_target_consts
from bipymc_tpu.ops.tiling import round_up

_LANE = 128

# scal lane assignments ([K, n, LANE] per-chain packed scalars)
S_SZ1, S_SW, S_LU1, S_LU2 = 0, 1, 2, 3


def _make_kernel(closed_fn, const_shapes, delayed, spc):
    nc = len(const_shapes)

    def kernel(*refs):
        # MH/AM (delayed=False) kernels take NO dy2 operand: the stage-2
        # displacements are dead there, and an unread ref would still be
        # DMA'd into VMEM every grid cell
        if delayed:
            x0_ref, lp0_ref, dy1_ref, dy2_ref, scal_ref = refs[:5]
            rest = refs[5:]
        else:
            x0_ref, lp0_ref, dy1_ref, scal_ref = refs[:4]
            dy2_ref = None
            rest = refs[4:]
        const_refs = rest[:nc]
        xh_ref, aux_ref, x_scr, lp_scr = rest[nc:]
        consts = [cref[:] if len(shape) >= 2 else cref[:].reshape(shape)
                  for cref, shape in zip(const_refs, const_shapes)]
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _init():
            x_scr[:] = x0_ref[:]
            lp_scr[:] = lp0_ref[:]

        x = x_scr[:]                              # [BC, Dp]
        lp = lp_scr[:, 0:1]                       # [BC, 1]

        # spc steps per grid cell: one DMA latency amortised over spc
        # steps (the per-step blocks are tiny — at n_chains=1 the cell's
        # pipeline is latency-bound, not bandwidth-bound). Statically
        # unrolled; identical math for every spc.
        for s in range(spc):
            scal = scal_ref[0, s]                 # [BC, LANE]

            # ---- stage 1: y₁ = θ + L z₁ (displacement precomputed) ------
            y1 = x + dy1_ref[0, s]
            l1 = closed_fn(y1, *consts)           # [BC, 1]
            log_a1 = jnp.minimum(0.0, l1 - lp)
            # non-finite hard-reject, sanitizing LOG_A1 itself (round-5
            # review: guarding only the accept bit leaves log_a1 = 0 in
            # the Green–Mira denominator below, and a +inf l1 then makes
            # stage 2 accept almost surely). Identical math to
            # samplers/rw.py / flowmh.py. Elementwise — traces in Mosaic.
            log_a1 = jnp.where(jnp.isfinite(l1), log_a1,
                               jnp.full_like(log_a1, -jnp.inf))
            acc1 = scal[:, S_LU1:S_LU1 + 1] < log_a1

            if delayed:
                # ---- stage 2: Green–Mira in whitened coordinates --------
                y2 = x + dy2_ref[0, s]
                l2 = closed_fn(y2, *consts)
                log_a1_rev = jnp.minimum(0.0, l1 - l2)
                lq_diff = -0.5 * (scal[:, S_SW:S_SW + 1]
                                  - scal[:, S_SZ1:S_SZ1 + 1])
                log_num = l2 + _log1mexp(log_a1_rev)
                log_den = lp + _log1mexp(log_a1)
                log_a2 = jnp.minimum(0.0, log_num + lq_diff - log_den)
                log_a2 = jnp.where(jnp.isfinite(l2), log_a2,
                                   jnp.full_like(log_a2, -jnp.inf))
                acc2 = jnp.logical_and(jnp.logical_not(acc1),
                                       scal[:, S_LU2:S_LU2 + 1] < log_a2)
            else:
                y2, l2 = y1, l1
                acc2 = jnp.zeros_like(acc1)

            x = jnp.where(acc1, y1, jnp.where(acc2, y2, x))
            lp = jnp.where(acc1, l1, jnp.where(acc2, l2, lp))
            stage = jnp.where(acc1, 1.0, jnp.where(acc2, 2.0, 0.0))

            xh_ref[0, s] = x
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (x.shape[0], _LANE), 1)
            acc_f = jnp.logical_or(acc1, acc2).astype(x.dtype)
            aux_ref[0, s] = jnp.where(
                lane == 0, lp,
                jnp.where(lane == 1, acc_f,
                          jnp.where(lane == 2, stage, 0.0)))

        x_scr[:] = x
        lp_scr[:] = jnp.broadcast_to(lp, lp_scr.shape)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("log_prob_block", "delayed", "block_chains",
                     "interpret", "steps_per_cell"))
def fused_rw_chunk_pallas(x0, logp0, dy1, dy2, scal, log_prob_block,
                          delayed, block_chains=256, interpret=False,
                          steps_per_cell=1):
    """Advance K random-walk steps in one kernel launch.

    x0 [n, d]; logp0 [n]; dy1/dy2 [K, n, d] precomputed stage-1/2
    proposal displacements (L z₁, (L/√κ) z₂ against the chunk's frozen
    Cholesky); scal [K, n, 4] packed per-chain scalars
    (‖z₁‖², ‖z₁ − z₂/√κ‖², log u₁, log u₂). With ``delayed=False`` pass
    ``dy2=None`` and zero the unused scal lanes — the kernel then takes
    no stage-2 operand (no dead DMA), and only the log u₁ lane is read.
    log_prob_block: hashable ``[BC, Dp] -> [BC, 1]`` on zero-padded lanes
    (ops/fused_chunk.block_logp_from_scalar). steps_per_cell: steps
    handled per grid cell (must divide K; identical results for every
    value — it only moves DMA-latency amortisation). Returns
    (x_hist [K, n, d], logp_hist [K, n], accepted [K, n] bool,
    stage [K, n] int32).
    """
    K, n, d = dy1.shape
    dtype = x0.dtype
    spc = int(steps_per_cell)
    if K % spc != 0:
        raise ValueError(f"steps_per_cell={spc} must divide K={K}")
    bc = min(block_chains, round_up(n, 8))
    n_p = round_up(n, bc)
    d_p = round_up(d, _LANE)
    kc = K // spc

    def pad_knd(a):
        a = jnp.pad(a, ((0, 0), (0, n_p - n), (0, d_p - d)))
        return a.reshape(kc, spc, n_p, d_p)

    x0_p = jnp.pad(x0, ((0, n_p - n), (0, d_p - d)))
    lp0_p = jnp.pad(
        jnp.broadcast_to(logp0[:, None], (n, _LANE)), ((0, n_p - n), (0, 0)))
    scal_p = jnp.pad(scal, ((0, 0), (0, n_p - n),
                            (0, _LANE - scal.shape[2]))).reshape(
                                kc, spc, n_p, _LANE)

    nb = n_p // bc
    grid = (nb, kc)
    knd = pl.BlockSpec((1, spc, bc, d_p), lambda nb_, k_: (k_, 0, nb_, 0),
                       memory_space=pltpu.VMEM)

    # hoist target-closure constants into kernel inputs (Pallas kernels
    # cannot capture array consts)
    closed_fn, consts_2d, const_shapes, const_specs = hoist_target_consts(
        log_prob_block, bc, d_p, dtype)

    scal_spec = pl.BlockSpec((1, spc, bc, _LANE),
                             lambda nb_, k_: (k_, 0, nb_, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((bc, d_p), lambda nb_, k_: (nb_, 0),
                     memory_space=pltpu.VMEM),              # x0
        pl.BlockSpec((bc, _LANE), lambda nb_, k_: (nb_, 0),
                     memory_space=pltpu.VMEM),              # lp0
        knd,                                                # dy1
    ]
    # delayed=False kernels take no dy2 operand at all — the stage-2
    # displacements are dead and would otherwise be DMA'd per grid cell
    operands = [x0_p, lp0_p, pad_knd(dy1)]
    if delayed:
        in_specs.append(knd)                                # dy2
        operands.append(pad_knd(dy2))
    in_specs.append(scal_spec)                              # scal
    operands.append(scal_p)

    xh, aux = pl.pallas_call(
        _make_kernel(closed_fn, const_shapes, bool(delayed), spc),
        grid=grid,
        in_specs=in_specs + list(const_specs),
        out_specs=[
            knd,                                            # x hist
            scal_spec,                                      # aux
        ],
        out_shape=[
            jax.ShapeDtypeStruct((kc, spc, n_p, d_p), dtype),
            jax.ShapeDtypeStruct((kc, spc, n_p, _LANE), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bc, d_p), dtype),
            pltpu.VMEM((bc, _LANE), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*operands, *consts_2d)

    xh = xh.reshape(K, n_p, d_p)
    aux = aux.reshape(K, n_p, _LANE)
    return (xh[:, :n, :d], aux[:, :n, 0],
            aux[:, :n, 1] > 0.5, aux[:, :n, 2].astype(jnp.int32))
