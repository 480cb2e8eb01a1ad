"""Batched blocked Cholesky — one Pallas kernel per batch-of-BG matrices.

Why this exists (round 3): BASELINE config 4's hot loop is a *batched*
Cholesky — one [n, n] Gram factorisation per vmapped chain per DR stage —
and XLA's batched ``cholesky`` turns out to be critical-path-bound, NOT
FLOP-bound: measured on v5e, per-matrix time at n=512 is ~255µs at B=1
and plateaus at ~112µs for every B ≥ 16 (≈400 GFLOP/s, <1% of the chip's
f32 peak). XLA lowers the factorisation to a sequential blocked HLO loop
and the batch only widens the tiny per-panel ops, so adding chains stops
paying almost immediately (benchmarks/config4_scaling.json).

This kernel attacks the critical path directly: each grid cell factors
``BG`` matrices *simultaneously* in their natural [BG, n, n] layout —

- the ~n sequential micro-eliminations (the irreducible serial chain of
  any Cholesky) each operate on a [BG, 1, n] row-batch instead of one
  row, so the serial chain is paid once per BG matrices rather than per
  matrix;
- panel and trailing updates are BATCHED MXU contractions
  (``dot_general`` with a leading batch dimension — out [BG, r, r]
  subtracts in place, no transposes or relayouts anywhere);
- the rank-W micro-panel [A | I] scheme is inherited from the single-
  matrix kernel (ops/pallas_chol.py): the trailing Schur complement
  stays symmetric, so multipliers are masked pivot rows and Lkk⁻¹ comes
  out for free, making the off-diagonal panel one batched matmul.

Numerics: identical operation ORDER to ops/pallas_chol.py per matrix —
values match jnp.linalg.cholesky to f32 roundoff (tests/test_pallas_bchol.py).
Used by GpRegressor through a ``jax.custom_batching.custom_vmap`` rule:
un-vmapped callers keep XLA's single-matrix cholesky, vmapped TPU f32
callers with enough batch route here (gp/regressor.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bipymc_tpu.ops.tiling import round_up

_B = 128
_W = 32           # micro-panel width (32 measured best for the unbatched
                  # kernel; the dependent micro-chain dominates either way)
_BG = 8           # matrices per grid cell: batch rides the sublane axis of
                  # every [BG, 1, n] row op — 8 fills an f32 (8, 128) tile


def _make_kernel(n_pad, bg, with_rhs=False):
    nb = n_pad // _B
    f32 = jnp.float32

    # batched dot_general: contract dim 1 (rows/W), batch dim 0 (BG)
    bcontract = (((1,), (1,)), ((0,), (0,)))
    # batched "A @ Bᵀ": contract last dims, batch dim 0
    bdot_nt = (((2,), (2,)), ((0,), (0,)))

    def kernel(*refs):
        # with_rhs weaves a blocked forward substitution z = L⁻¹y through
        # the factorisation (the GP log-ML path: XLA's batched
        # triangular_solve has the same sequential-HLO plateau the batched
        # cholesky had, and the two ops it needs — y_k·Lkk⁻ᵀ and the
        # trailing y_i −= z_k·Gᵀ — are the SAME bdot_nt contraction the
        # panel already runs, so the solve rides along for ~free).
        # y/z ride as [BG, 8, n_pad] row-vectors (8 identical sublanes fill
        # one f32 tile; cost is O(n·B) per block vs the panel's O(r·B²)).
        if with_rhs:
            a_ref, y_ref, out_ref, z_ref, ml_ref, mr_ref = refs
        else:
            a_ref, out_ref, ml_ref, mr_ref = refs
            y_ref = z_ref = None
        out_ref[:] = a_ref[:]
        if with_rhs:
            z_ref[:] = y_ref[:]
        ri = lax.broadcasted_iota(jnp.int32, (1, _B, _B), 1)
        ci = lax.broadcasted_iota(jnp.int32, (1, _B, _B), 2)

        lane = lax.broadcasted_iota(jnp.int32, (1, 1, _B), 2)
        srow = lax.broadcasted_iota(jnp.int32, (1, _W, 1), 1)  # slab row
        rrow = lax.broadcasted_iota(jnp.int32, (1, _B, 1), 1)  # block row

        for k in range(nb):
            o = k * _B

            ml_ref[:] = out_ref[:, pl.ds(o, _B), pl.ds(o, _B)]
            mr_ref[:] = jnp.broadcast_to((ri == ci).astype(f32),
                                         (bg, _B, _B))

            def macro_step(p, _):
                base = p * _W
                sl_l = ml_ref[:, pl.ds(base, _W), :]       # [BG, W, B]
                sl_r = mr_ref[:, pl.ds(base, _W), :]
                for jj in range(_W):
                    gcol = base + jj
                    row_l = sl_l[:, jj:jj + 1, :]          # [BG, 1, B]
                    piv = jnp.sum(jnp.where(lane == gcol, row_l, 0.0),
                                  axis=2, keepdims=True)   # [BG, 1, 1]
                    s = lax.rsqrt(piv)
                    r_l = row_l * s
                    r_r = sl_r[:, jj:jj + 1, :] * s
                    # multipliers from symmetry: M[b, t, gcol] = r_l at
                    # lane (base+t); active rows only (t > jj)
                    col = jnp.sum(
                        jnp.where(lane == base + srow, r_l, 0.0),
                        axis=2, keepdims=True)             # [BG, W, 1]
                    col = jnp.where(srow > jj, col, 0.0)
                    is_jj = srow == jj
                    sl_l = jnp.where(is_jj, r_l, sl_l - col * r_l)
                    sl_r = jnp.where(is_jj, r_r, sl_r - col * r_r)
                ml_ref[:, pl.ds(base, _W), :] = sl_l
                mr_ref[:, pl.ds(base, _W), :] = sl_r
                # rank-W update of the rows below the slab (batched MXU):
                # upd[b, t, c] = Σ_jj rm[b, jj, t] · sl[b, jj, c]
                rm = jnp.where(lane > base + srow, sl_l, 0.0)
                upd_l = lax.dot_general(rm, sl_l, bcontract,
                                        precision=lax.Precision.HIGHEST,
                                        preferred_element_type=f32)
                upd_r = lax.dot_general(rm, sl_r, bcontract,
                                        precision=lax.Precision.HIGHEST,
                                        preferred_element_type=f32)
                below = rrow >= base + _W                  # [1, B, 1]
                ml_ref[:] = jnp.where(below, ml_ref[:] - upd_l, ml_ref[:])
                mr_ref[:] = jnp.where(below, mr_ref[:] - upd_r, mr_ref[:])
                return 0

            lax.fori_loop(0, _B // _W, macro_step, 0)
            linv = mr_ref[:]                               # [BG, B, B]
            lkk = jnp.transpose(ml_ref[:], (0, 2, 1)) * \
                (ci <= ri).astype(f32)
            out_ref[:, pl.ds(o, _B), pl.ds(o, _B)] = lkk

            if with_rhs:
                # z_k = Lkk⁻¹ (y_k − Σ_{j<k} L_kj z_j): the block's y is
                # already trailing-updated, and linv[j, c] = (Lkk⁻¹)[j, c]
                # so the row form zᵀ = yᵀ·Lkk⁻ᵀ is one bdot_nt
                yk = z_ref[:, :, pl.ds(o, _B)]             # [BG, 8, B]
                zk = lax.dot_general(yk, linv, bdot_nt,
                                     precision=lax.Precision.HIGHEST,
                                     preferred_element_type=f32)
                z_ref[:, :, pl.ds(o, _B)] = zk

            if k < nb - 1:
                r = n_pad - o - _B                         # static per k
                # panel: G = A[:, o+B:, o:o+B] @ Lkk⁻ᵀ (batched MXU)
                panel = out_ref[:, pl.ds(o + _B, r), pl.ds(o, _B)]
                g = lax.dot_general(panel, linv, bdot_nt,
                                    precision=lax.Precision.HIGHEST,
                                    preferred_element_type=f32)
                out_ref[:, pl.ds(o + _B, r), pl.ds(o, _B)] = g
                # trailing: A[:, o+B:, o+B:] -= G Gᵀ (batched MXU)
                trail = out_ref[:, pl.ds(o + _B, r), pl.ds(o + _B, r)]
                out_ref[:, pl.ds(o + _B, r), pl.ds(o + _B, r)] = (
                    trail - lax.dot_general(
                        g, g, bdot_nt,
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=f32))
                if with_rhs:
                    # trailing substitution: y_i −= G z_k (row form via
                    # the same contraction: Σ_c zk[s,c]·g[i,c])
                    ztail = z_ref[:, :, pl.ds(o + _B, r)]
                    z_ref[:, :, pl.ds(o + _B, r)] = (
                        ztail - lax.dot_general(
                            zk, g, bdot_nt,
                            precision=lax.Precision.HIGHEST,
                            preferred_element_type=f32))

        # zero the strict upper triangle
        fri = lax.broadcasted_iota(jnp.int32, (1, n_pad, n_pad), 1)
        fci = lax.broadcasted_iota(jnp.int32, (1, n_pad, n_pad), 2)
        out_ref[:] = jnp.where(fci <= fri, out_ref[:], 0.0)

    return kernel


def _bchol_fwd_impl(a, interpret, y=None):
    b, n = a.shape[0], a.shape[-1]
    n_pad = round_up(n, _B)
    # VMEM budget: the pipelined in+out blocks cost ~4·BG·n²·4B (double
    # buffering on each side) plus scratch; v5e has 128MB VMEM but the
    # default scoped limit is 16MB, so we raise vmem_limit_bytes and
    # shrink BG as n grows (BG=8 → n ≤ 724 under a ~100MB budget)
    budget = 100 * 2 ** 20
    bg = min(_BG, b, max(1, budget // (16 * n_pad * n_pad)))
    b_pad = round_up(b, bg)
    if n_pad != n or b_pad != b:
        # pad matrices with identity (keeps padded pivots at 1) and the
        # batch with identity matrices
        eye = jnp.broadcast_to(jnp.eye(n_pad, dtype=a.dtype),
                               (b_pad, n_pad, n_pad))
        a = eye.at[:b, :n, :n].set(a)
    mat_spec = pl.BlockSpec((bg, n_pad, n_pad), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs, operands = [mat_spec], [a]
    out_specs = [mat_spec]
    out_shape = [jax.ShapeDtypeStruct((b_pad, n_pad, n_pad), a.dtype)]
    if y is not None:
        # y rides as [b, 8, n_pad] row-vectors (8 identical sublanes fill
        # an f32 tile); zero-padded columns stay zero through the solve
        yp = jnp.zeros((b_pad, 8, n_pad), a.dtype)
        yp = yp.at[:b, :, :n].set(
            jnp.broadcast_to(y[:, None, :], (b, 8, n)))
        row_spec = pl.BlockSpec((bg, 8, n_pad), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        in_specs.append(row_spec)
        operands.append(yp)
        out_specs.append(row_spec)
        out_shape.append(jax.ShapeDtypeStruct((b_pad, 8, n_pad), a.dtype))
    out = pl.pallas_call(
        _make_kernel(n_pad, bg, with_rhs=y is not None),
        grid=(b_pad // bg,),
        in_specs=in_specs,
        out_specs=out_specs if y is not None else out_specs[0],
        out_shape=out_shape if y is not None else out_shape[0],
        scratch_shapes=[pltpu.VMEM((bg, _B, _B), jnp.float32),
                        pltpu.VMEM((bg, _B, _B), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.2 * budget)),
        interpret=interpret,
    )(*operands)
    if y is not None:
        lmat, z = out
        return lmat[:b, :n, :n], z[:b, 0, :n]
    return out[:b, :n, :n]


def _phi_batched(x):
    """Φ(X) = tril(X) with the diagonal halved, batched via masks."""
    n = x.shape[-1]
    ri = lax.broadcasted_iota(jnp.int32, (1, n, n), 1)
    ci = lax.broadcasted_iota(jnp.int32, (1, n, n), 2)
    return jnp.where(ci < ri, x, jnp.where(ci == ri, 0.5 * x, 0.0))


def _bchol_bwd_impl(l, lbar):
    """Batched Cholesky adjoint (Murray 2016; same ¼ convention as
    ops/pallas_chol.py — matches jax's cholesky cotangent)."""
    solve = jax.scipy.linalg.solve_triangular
    lt = jnp.swapaxes(l, -1, -2)
    p = _phi_batched(jnp.matmul(lt, lbar))
    sym = p + jnp.swapaxes(p, -1, -2)
    x = solve(l, sym, lower=True, trans=1)
    s = jnp.swapaxes(
        solve(l, jnp.swapaxes(x, -1, -2), lower=True, trans=1), -1, -2)
    return 0.25 * (s + jnp.swapaxes(s, -1, -2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def cholesky_batched_pallas(a, interpret=False):
    """Lower-triangular Cholesky of a BATCH of SPD matrices [B, n, n].

    One Pallas launch; grid cells factor ``min(8, B)`` matrices each with
    the serial elimination chain shared across the cell's batch. f32
    only; n ≤ 1024 (cell buffers in VMEM). ``interpret=True`` for
    off-TPU tests.
    """
    return _bchol_fwd_impl(a, interpret)


def _fwd(a, interpret):
    l = _bchol_fwd_impl(a, interpret)
    return l, l


def _bwd(interpret, l, lbar):
    return (_bchol_bwd_impl(l, lbar),)


cholesky_batched_pallas.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def cholesky_solve_batched_pallas(a, y, interpret=False):
    """Fused ``(L, z) = (chol(A), L⁻¹y)`` for a batch of SPD systems.

    a [B, n, n]; y [B, n] → (L [B, n, n], z [B, n]). One Pallas launch:
    the blocked forward substitution is woven through the factorisation
    (per block, ``z_k = y_k·Lkk⁻ᵀ`` and the trailing ``y −= z_k·Gᵀ`` are
    the same batched-MXU contraction shape the panel update already
    runs), so the separate batched ``triangular_solve`` — which has the
    same sequential-HLO critical-path plateau XLA's batched ``cholesky``
    has — disappears from the caller. This is the whole GP log-ML
    factor+solve (SURVEY.md §4.9: ``v = L⁻¹y``, ``yᵀK⁻¹y = ‖v‖²``,
    ``log|K| = 2Σlog L_ii``) in one kernel; GpRegressor routes vmapped
    log-ML evaluations here (BASELINE config 4's hot loop).

    L is the identical computation (bit-equal) to
    :func:`cholesky_batched_pallas`; z matches XLA's triangular solve to
    f32 roundoff (different but fixed re-association). Same limits as
    the plain kernel: f32, n ≤ ~1024. Differentiable (custom VJP below).
    """
    return _bchol_fwd_impl(a, interpret, y=y)


def _cs_fwd(a, y, interpret):
    l, z = _bchol_fwd_impl(a, interpret, y=y)
    return (l, z), (l, z)


def _cs_bwd(interpret, res, cots):
    """VJP of (L, z) = (chol(A), L⁻¹y).

    z-path: dz = L⁻¹(dy − dL·z) ⇒ ybar = L⁻ᵀ zbar and an extra Cholesky
    cotangent −(L⁻ᵀ zbar)zᵀ (lower-masked by the adjoint's Φ projection);
    then the standard batched Cholesky adjoint maps the combined Lbar to
    Abar."""
    l, z = res
    lbar, zbar = cots
    w = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(l, -1, -2), zbar[..., None], lower=False)
    ybar = w[..., 0]
    lbar = lbar - w * z[..., None, :]
    return _bchol_bwd_impl(l, lbar), ybar


cholesky_solve_batched_pallas.defvjp(_cs_fwd, _cs_bwd)
