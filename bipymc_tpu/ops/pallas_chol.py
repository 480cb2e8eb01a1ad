"""Single-kernel blocked Cholesky factorization for TPU.

XLA's TPU Cholesky lowers to a many-kernel blocked HLO loop whose cost is
launch/latency-bound at GP-relevant sizes — measured ~650µs for n=256..512
on v5e (scan-amortised), where the useful FLOPs justify tens of µs. This
kernel runs the whole right-looking blocked factorization in ONE Pallas
launch: each 128-wide diagonal block factors via rank-W micro-panel
[A | I] elimination (a W-row slab per macro-step + a rank-W MXU
trailing update), producing Lkkᵀ and Lkk⁻¹ together; the panel becomes
one MXU matmul against Lkk⁻ᵀ and the trailing update one MXU matmul —
no kernel boundaries anywhere.

Honest measurement (docs/design.md §10b): with the dispatch floor
amortised, XLA's blocked-HLO cholesky still WINS ~1.6× at n=256–1024 —
the rank-W micro-panel rewrite recovered 1.7× over the first per-column
version (86 vs 145µs at n=256, W=32), but ~128 dependent
micro-eliminations × fixed Mosaic op-issue overhead remain the floor. So
the GP module exposes it behind ``GpRegressor(pallas_chol=True)`` (OFF by
default, TPU only, n ≤ 1024 — whole matrix in VMEM) and uses
``jnp.linalg.cholesky`` otherwise; BASELINE.json:5's Cholesky clause is
closed with code + measurement, and the measurement says XLA. Forward
values match jnp to f32 roundoff; the custom VJP implements the standard
Cholesky adjoint (Murray 2016) with triangular solves, matching jax's
gradient through ``jnp.linalg.cholesky`` (tests/test_pallas_chol.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bipymc_tpu.ops.tiling import round_up

_B = 128
_W = 32           # micro-panel width: 32 measured best of {8,16,32}; the
                  # dependent micro-elimination chain, not panel width,
                  # is the remaining floor



def _make_kernel(n_pad):
    nb = n_pad // _B
    f32 = jnp.float32

    def kernel(a_ref, out_ref, ml_ref, mr_ref):
        out_ref[:] = a_ref[:]
        ri = lax.broadcasted_iota(jnp.int32, (_B, _B), 0)
        ci = lax.broadcasted_iota(jnp.int32, (_B, _B), 1)

        lane = lax.broadcasted_iota(jnp.int32, (1, _B), 1)
        srow = lax.broadcasted_iota(jnp.int32, (_W, 1), 0)   # slab row idx
        rcol = lax.broadcasted_iota(jnp.int32, (_B, 1), 0)   # block row idx
        contract0 = (((0,), (0,)), ((), ()))

        for k in range(nb):
            o = k * _B

            # ---- [A | I] elimination in rank-W macro-steps --------------
            # The trailing Schur complement stays SYMMETRIC throughout, so
            # multipliers are always (masked) pivot rows — no column
            # extraction. Each macro-step factors a W-row slab (one
            # (8,128) tile) with W unrolled micro-eliminations, then
            # applies ONE rank-W MXU update to the rows below:
            #   M_below -= Σ_jj col_jj ⊗ R_jj = (masked slab)ᵀ · slab,
            # because col_jj[t] = R_jj[lane t] by symmetry. This replaces
            # B sequential [B,B] rank-1 passes with B/W slab steps whose
            # per-pivot work is a [W,B] tile — the per-iteration Mosaic
            # overhead was the whole cost of the v1 kernel.
            ml_ref[:] = out_ref[pl.ds(o, _B), pl.ds(o, _B)]
            mr_ref[:] = (ri == ci).astype(f32)

            def macro_step(p, _):
                base = p * _W
                sl_l = ml_ref[pl.ds(base, _W), :]      # [W,B]
                sl_r = mr_ref[pl.ds(base, _W), :]
                for jj in range(_W):
                    gcol = base + jj
                    row_l = sl_l[jj:jj + 1, :]         # [1,B] static slice
                    piv = jnp.sum(jnp.where(lane == gcol, row_l, 0.0))
                    s = lax.rsqrt(piv)
                    r_l = row_l * s
                    r_r = sl_r[jj:jj + 1, :] * s
                    # slab multipliers from symmetry: M[t, gcol] = r at
                    # lane (base+t); active rows only (t > jj)
                    col = jnp.sum(
                        jnp.where(lane == base + srow, r_l, 0.0),
                        axis=1, keepdims=True)         # [W,1]
                    col = jnp.where(srow > jj, col, 0.0)
                    is_jj = srow == jj
                    sl_l = jnp.where(is_jj, r_l, sl_l - col * r_l)
                    sl_r = jnp.where(is_jj, r_r, sl_r - col * r_r)
                ml_ref[pl.ds(base, _W), :] = sl_l
                mr_ref[pl.ds(base, _W), :] = sl_r
                # rank-W update of the rows below the slab: multipliers
                # W[t, jj] = R_jj[lane t] (zero at lanes ≤ pivot lane)
                rm = jnp.where(lane > base + srow, sl_l, 0.0)  # [W,B]
                upd_l = lax.dot_general(rm, sl_l, contract0,
                                        precision=lax.Precision.HIGHEST,
                                        preferred_element_type=f32)
                upd_r = lax.dot_general(rm, sl_r, contract0,
                                        precision=lax.Precision.HIGHEST,
                                        preferred_element_type=f32)
                below = rcol >= base + _W              # [B,1]
                ml_ref[:] = jnp.where(below, ml_ref[:] - upd_l, ml_ref[:])
                mr_ref[:] = jnp.where(below, mr_ref[:] - upd_r, mr_ref[:])
                return 0

            lax.fori_loop(0, _B // _W, macro_step, 0)
            linv = mr_ref[:]
            lkk = jnp.transpose(ml_ref[:]) * (ci <= ri).astype(f32)
            out_ref[pl.ds(o, _B), pl.ds(o, _B)] = lkk

            if k < nb - 1:
                r = n_pad - o - _B                     # static per k
                # panel: G = A[o+B:, o:o+B] @ Lkk⁻ᵀ  (one MXU matmul)
                panel = out_ref[pl.ds(o + _B, r), pl.ds(o, _B)]
                g = jnp.dot(panel, jnp.transpose(linv),
                            precision=lax.Precision.HIGHEST,
                            preferred_element_type=f32)
                out_ref[pl.ds(o + _B, r), pl.ds(o, _B)] = g
                # trailing: A[o+B:, o+B:] -= G Gᵀ  (one MXU matmul)
                trail = out_ref[pl.ds(o + _B, r), pl.ds(o + _B, r)]
                out_ref[pl.ds(o + _B, r), pl.ds(o + _B, r)] = (
                    trail - jnp.dot(g, jnp.transpose(g),
                                    precision=lax.Precision.HIGHEST,
                                    preferred_element_type=f32))

        # zero the strict upper triangle of the full matrix
        fri = lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
        fci = lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
        out_ref[:] = jnp.where(fci <= fri, out_ref[:], 0.0)

    return kernel


def _chol_fwd_impl(a, interpret):
    n = a.shape[-1]
    n_pad = round_up(n, _B)
    # pad with identity so padded pivots are 1 (keeps rsqrt finite)
    if n_pad != n:
        eye = jnp.eye(n_pad, dtype=a.dtype)
        a = eye.at[:n, :n].set(a)
    # whole-matrix VMEM residency: in + out alone are 2·n_pad²·4B, over
    # the 16MB scoped default from n_pad ≥ 1536 (the §10d lesson) —
    # raise the scoped limit toward the chip's 128MB for big single
    # matrices (n=2048 → ~38MB requested; measured OOM at the default)
    params = {}
    if n_pad >= 1536:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        _make_kernel(n_pad),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), a.dtype),
        scratch_shapes=[pltpu.VMEM((_B, _B), jnp.float32),
                        pltpu.VMEM((_B, _B), jnp.float32)],
        interpret=interpret,
        **params,
    )(a)
    return out[:n, :n]


def _phi(x):
    """Φ(X) = tril(X) with the diagonal halved (Cholesky adjoint helper)."""
    return jnp.tril(x) - 0.5 * jnp.diag(jnp.diag(x))


def _chol_bwd_impl(l, lbar):
    """Standard Cholesky reverse-mode adjoint (Murray 2016):
    Ā = ¼ L⁻ᵀ (Φ(Lᵀ L̄) + Φ(Lᵀ L̄)ᵀ) L⁻¹, as two triangular solves.
    The ¼ (not ½) matches jax's convention for ``jnp.linalg.cholesky``,
    whose cotangent is symmetric with HALF the sensitivity on each of the
    (i,j)/(j,i) mirror entries (verified against jax.vjp elementwise)."""
    solve = jax.scipy.linalg.solve_triangular
    p = _phi(jnp.matmul(l.T, lbar))
    sym = p + p.T
    # S = L⁻ᵀ sym L⁻¹:  solve Lᵀ X = sym, then (Lᵀ Yᵀ = Xᵀ)ᵀ
    x = solve(l, sym, lower=True, trans=1)
    s = solve(l, x.T, lower=True, trans=1).T
    return 0.25 * (s + s.T)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def cholesky_pallas(a, interpret=False):
    """Lower-triangular Cholesky factor of SPD ``a`` [n, n] (2-D only).

    One fused TPU kernel per matrix. For batches, ``jax.vmap`` this —
    vmap lifts the call onto the Pallas grid (tested); passing an array
    with leading batch dims directly is a shape error. ``interpret=True``
    runs the Mosaic interpreter off-TPU for tests. Requires n ≤ ~1024
    (whole matrix in VMEM); callers fall back to ``jnp.linalg.cholesky``
    above that.
    """
    return _chol_fwd_impl(a, interpret)


def _fwd(a, interpret):
    l = _chol_fwd_impl(a, interpret)
    return l, l


def _bwd(interpret, l, lbar):
    return (_chol_bwd_impl(l, lbar),)


cholesky_pallas.defvjp(_fwd, _bwd)
