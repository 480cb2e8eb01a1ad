"""Fused multi-generation DREAM-zs chunk: the whole sampler in ONE kernel.

Round-2/3 measurements (docs/design.md §5b, §10c) established that the
256-chain DREAM generation is *dispatch-bound*: ~25 small XLA/Pallas
launches per generation cost ~31µs while the useful VPU math is ~1-2µs.
Fusing single ops (accept/update) LOST because each kernel boundary pays
operand pack/unpack per generation. This module removes the boundary
itself: one ``pallas_call`` advances ``G = archive_thin`` generations
with the population state (x, logp) carried in VMEM scratch across a
sequential grid, so per-generation cost collapses to streamed-input DMA
plus the math.

Why G = archive_thin is the natural chunk: the archive Z is *constant*
within such a chunk by construction — the per-generation engine
(samplers/dream.py step) appends to Z only at generations
``gen % archive_thin == archive_thin-1``, i.e. the chunk's last
generation, *after* its proposal consumed Z. All row gathers for the
chunk can therefore be precomputed OUTSIDE the kernel by XLA (they
depend only on pregenerated random bits and the chunk-start archive),
and the in-kernel loop needs no dynamic gathers — the operation Mosaic
cannot do fast. Semantics are exactly the per-generation engine's.

Division of labour per chunk (samplers/dream_fused.py drives this):

- XLA (once per chunk): threefry bits for all G generations —
  *identical streams* to the per-generation engine — uniform/normal
  conversion, distinct row indices (ops/distinct_idx.py), the Z row
  gather, per-chain scalar packing, and the archive append at the end.
- Pallas (this kernel): for g = 0..G-1 — crossover/snooker proposal
  math (ops/dream_proposal.propose_block, the same function the
  per-generation kernel runs), the target log-density (inlined
  ``log_prob_block``), and Metropolis accept/select. x and logp live in
  VMEM scratch; per-generation inputs stream in and history streams out
  through the pipelined grid.

The target must be expressible on a lane-padded block:
``log_prob_block(x_pad [BC, Dp]) -> [BC, 1]`` with pad lanes zero (see
``block_logp_from_scalar`` for the generic wrapper). Trajectories match
the per-generation engine bit-for-bit in randomness and up to float
re-association in math (tests/test_fused_chunk.py pins exact equality
against the pallas-proposal per-generation path in interpret mode).

Reference parity: this accelerates the same DREAM-zs algorithm as the
reference's ``DreamZs`` (SURVEY.md §4.7); it is an execution strategy,
not a new sampler.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bipymc_tpu.ops.dream_proposal import propose_block
from bipymc_tpu.ops.tiling import round_up

_LANE = 128

# scal lane assignments ([G, n, LANE] per-chain packed scalars)
S_DELTA, S_CR, S_GS, S_SNK, S_GJUMP, S_LOGU = 0, 1, 2, 3, 4, 5


def block_logp_from_scalar(log_prob, d):
    """Wrap a scalar ``log_prob(theta [d]) -> []`` for in-kernel use.

    Slices the true dims off the lane-padded block and vmaps. Works for
    any jnp-expressible target whose ops Mosaic supports (elementwise,
    reductions, small dots); targets with gathers/linalg need the
    per-generation engine instead.
    """
    def f(x_pad):
        return jax.vmap(log_prob)(x_pad[:, :d])[:, None]
    return f


def _make_kernel(closed_fn, const_shapes, n_pairs, d_true, b, b_star):
    nc = len(const_shapes)

    def kernel(*refs):
        (x0_ref, lp0_ref, rows_ref, um_ref, ue_ref, eps_ref,
         scal_ref) = refs[:7]
        const_refs = refs[7:7 + nc]
        xh_ref, aux_ref, x_scr, lp_scr = refs[7 + nc:]
        # target-closure constants arrive as kernel inputs (Pallas
        # kernels cannot capture array constants): rank ≥ 2 native,
        # rank < 2 lifted to (1, k) (restored here — Mosaic handles the
        # leading-singleton drop; arbitrary reshapes it does not)
        consts = [cref[:] if len(shape) >= 2 else cref[:].reshape(shape)
                  for cref, shape in zip(const_refs, const_shapes)]
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _init():
            x_scr[:] = x0_ref[:]
            lp_scr[:] = lp0_ref[:]

        x = x_scr[:]                              # [BC, Dp]
        lp = lp_scr[:, 0:1]                       # [BC, 1]
        scal = scal_ref[0]                        # [BC, LANE]

        x_star, log_jac, _ = propose_block(
            x, rows_ref[0], um_ref[0], ue_ref[0], eps_ref[0],
            scal[:, S_DELTA:S_DELTA + 1],
            scal[:, S_CR:S_CR + 1],
            scal[:, S_GS:S_GS + 1],
            scal[:, S_SNK:S_SNK + 1],
            scal[:, S_GJUMP:S_GJUMP + 1],
            n_pairs, d_true, b, b_star)

        lps = closed_fn(x_star, *consts)          # [BC, 1]
        # Metropolis-with-Jacobian accept; NaN/-inf proposals always
        # reject (same guard as samplers/dream.py step)
        log_alpha = jnp.minimum(0.0, lps - lp + log_jac)
        log_alpha = jnp.where(jnp.isfinite(lps), log_alpha, -jnp.inf)
        acc = scal[:, S_LOGU:S_LOGU + 1] < log_alpha
        x_new = jnp.where(acc, x_star, x)
        lp_new = jnp.where(acc, lps, lp)

        x_scr[:] = x_new
        lp_scr[:] = jnp.broadcast_to(lp_new, lp_scr.shape)
        xh_ref[0] = x_new
        lane = jax.lax.broadcasted_iota(jnp.int32, lp_scr.shape, 1)
        aux_ref[0] = jnp.where(
            lane == 0, lp_new,
            jnp.where(lane == 1, acc.astype(x.dtype), 0.0))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("log_prob_block", "n_pairs", "d_true", "b", "b_star",
                     "block_chains", "interpret"))
def fused_chunk_pallas(x0, logp0, rows, u_mask, u_e, eps, scal,
                       log_prob_block, n_pairs, d_true, b, b_star,
                       block_chains=256, interpret=False):
    """Advance G generations in one kernel launch.

    x0 [n, d]; logp0 [n]; rows [G, n, k, d] pregathered archive rows;
    u_mask/u_e/eps [G, n, d]; scal [G, n, 6] packed per-chain scalars
    (delta, cr, gamma_s, is_snooker, gamma_jump, log_u_accept).
    log_prob_block: hashable callable, ``[BC, Dp] -> [BC, 1]`` on
    zero-padded lanes. Returns (x_hist [G, n, d], logp_hist [G, n],
    accepted [G, n] bool).
    """
    G, n, k, d = rows.shape
    dtype = x0.dtype
    bc = min(block_chains, round_up(n, 8))
    n_p = round_up(n, bc)
    d_p = round_up(d, _LANE)

    def pad_gnd(a, fill=0.0):
        return jnp.pad(a, ((0, 0), (0, n_p - n), (0, d_p - d)),
                       constant_values=fill)

    x0_p = jnp.pad(x0, ((0, n_p - n), (0, d_p - d)))
    lp0_p = jnp.pad(
        jnp.broadcast_to(logp0[:, None], (n, _LANE)), ((0, n_p - n), (0, 0)))
    rows_p = jnp.pad(rows, ((0, 0), (0, n_p - n), (0, 0), (0, d_p - d)))
    um_p = pad_gnd(u_mask, fill=2.0)   # pads never enter mask/argmin
    ue_p = pad_gnd(u_e)
    eps_p = pad_gnd(eps)
    scal_p = jnp.pad(scal, ((0, 0), (0, n_p - n),
                            (0, _LANE - scal.shape[2])))

    nb = n_p // bc
    grid = (nb, G)
    gnd = pl.BlockSpec((1, bc, d_p), lambda nb_, g_: (g_, nb_, 0),
                       memory_space=pltpu.VMEM)

    # hoist the target's closure constants (mode centres, data, …) into
    # kernel inputs — Pallas kernels cannot capture array constants, and
    # closure_convert only extracts tracers, so trace to a jaxpr and pull
    # the concrete consts explicitly. Flattened to (1, size) so every
    # const is a legal 2-D VMEM block; the kernel restores the shapes.
    closed = jax.make_jaxpr(log_prob_block)(
        jax.ShapeDtypeStruct((bc, d_p), dtype))
    consts = closed.consts

    def closed_fn(xb, *cs):
        out = jax.core.eval_jaxpr(closed.jaxpr, cs, xb)
        return out[0]

    const_shapes = tuple(tuple(c.shape) for c in consts)
    consts_2d = [c if c.ndim >= 2 else jnp.reshape(c, (1, -1))
                 for c in consts]
    const_specs = [
        pl.BlockSpec(c.shape, lambda *_, _nd=c.ndim: (0,) * _nd,
                     memory_space=pltpu.VMEM)
        for c in consts_2d]

    xh, aux = pl.pallas_call(
        _make_kernel(closed_fn, const_shapes, n_pairs, d_true, float(b),
                     float(b_star)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bc, d_p), lambda nb_, g_: (nb_, 0),
                         memory_space=pltpu.VMEM),             # x0
            pl.BlockSpec((bc, _LANE), lambda nb_, g_: (nb_, 0),
                         memory_space=pltpu.VMEM),             # lp0
            pl.BlockSpec((1, bc, k, d_p), lambda nb_, g_: (g_, nb_, 0, 0),
                         memory_space=pltpu.VMEM),             # rows
            gnd,                                               # u_mask
            gnd,                                               # u_e
            gnd,                                               # eps
            pl.BlockSpec((1, bc, _LANE), lambda nb_, g_: (g_, nb_, 0),
                         memory_space=pltpu.VMEM),             # scal
            *const_specs,                                      # target consts
        ],
        out_specs=[
            gnd,                                               # x hist
            pl.BlockSpec((1, bc, _LANE), lambda nb_, g_: (g_, nb_, 0),
                         memory_space=pltpu.VMEM),             # aux
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, n_p, d_p), dtype),
            jax.ShapeDtypeStruct((G, n_p, _LANE), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bc, d_p), dtype),
            pltpu.VMEM((bc, _LANE), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(x0_p, lp0_p, rows_p, um_p, ue_p, eps_p, scal_p, *consts_2d)

    return (xh[:, :n, :d], aux[:, :n, 0],
            aux[:, :n, 1] > 0.5)
