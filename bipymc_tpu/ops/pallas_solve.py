"""Blocked triangular solves as Pallas TPU kernels.

BASELINE.json:5 scopes the GP's likelihood work as "kernel-matrix builds
plus Cholesky/triangular solves" running as Pallas kernels. The kernel
build lives in :mod:`bipymc_tpu.ops.pallas_kernels`; this module provides
the solves: blocked forward substitution for ``L x = b`` and blocked
backward substitution for ``Lᵀ y = c`` (L lower-triangular), plus a
``solve_chol`` composition. All are differentiable via custom VJPs built
from the same kernels.

Design (MXU-first): partition L into B×B blocks. The diagonal-block
inverses are precomputed (one vmapped small ``solve_triangular`` against
identity — O(n·B²) total), so the per-block-row update is pure matmul:

    x_i = invL_ii @ (b_i − L[i, :] @ X)

where X is a VMEM scratch accumulator holding already-solved blocks (rows
≥ i·B are still zero, so the full-row matmul picks up exactly the j < i
terms). The grid iterates block rows sequentially ("arbitrary" dimension
semantics); each step is a [B, n] × [n, m] matmul on the MXU. This does
2× the minimal FLOPs (full rows instead of the lower-triangular prefix)
but replaces XLA's sequential scalar substitution with n/B MXU launches.

f32 matmuls use ``precision=HIGHEST`` — the MXU's default bf16 passes
lose ~3 decimal digits, which is fatal for substitution (errors compound
across block rows).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bipymc_tpu.ops.tiling import round_up

_HIGHEST = jax.lax.Precision.HIGHEST


def _pad_to(a, n, axis):
    pad = n - a.shape[axis]
    if pad <= 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


def _diag_block_inverses(L, block):
    """[nb, B, B] inverses of the diagonal blocks (small XLA solves)."""
    n = L.shape[0]
    nb = n // block
    blocks = jnp.stack([
        jax.lax.dynamic_slice(L, (i * block, i * block), (block, block))
        for i in range(nb)])
    eye = jnp.eye(block, dtype=L.dtype)
    return jax.vmap(lambda d: jax.scipy.linalg.solve_triangular(
        d, eye, lower=True))(blocks)


def _zero_scratch_blockwise(ref, block):
    """Zero a [n, m] scratch ref in block-row strips (bounded stack temp).

    Full zeroing is required before the first block-row's read: rows not
    yet solved are multiplied by L's zero blocks, but uninitialised VMEM
    can hold NaN bit patterns and NaN·0 = NaN.
    """
    zeros = jnp.zeros((block, ref.shape[1]), ref.dtype)

    def body(j, _):
        ref[pl.ds(j * block, block), :] = zeros
        return 0

    jax.lax.fori_loop(0, ref.shape[0] // block, body, 0)


def _fwd_kernel(l_row, b_blk, invd, out, x_acc):
    i = pl.program_id(1)
    block = out.shape[0]

    @pl.when(i == 0)
    def _():
        _zero_scratch_blockwise(x_acc, block)

    acc = b_blk[:] - jax.lax.dot_general(
        l_row[:], x_acc[:], (((1,), (0,)), ((), ())), precision=_HIGHEST)
    x_i = jax.lax.dot_general(
        invd[:], acc, (((1,), (0,)), ((), ())), precision=_HIGHEST)
    out[:] = x_i
    x_acc[pl.ds(i * block, block), :] = x_i


def _bwd_kernel(l_col, c_blk, invd_t, out, y_acc):
    """Backward substitution for Lᵀ y = c: block rows from the bottom up.

    y_i = invL_iiᵀ @ (c_i − (Lᵀ)[i, :] @ Y) = invL_iiᵀ @ (c_i − L[:, i]ᵀ Y).
    l_col is the [n, B] column block i of L; Y rows < i·B are still zero,
    so the full-column matmul picks up exactly the j > i terms.
    """
    k = pl.program_id(1)
    block = out.shape[0]
    nb = pl.num_programs(1)          # block-row axis (axis 0 is m-tiles)
    i = nb - 1 - k

    @pl.when(k == 0)
    def _():
        _zero_scratch_blockwise(y_acc, block)

    acc = c_blk[:] - jax.lax.dot_general(
        l_col[:], y_acc[:], (((0,), (0,)), ((), ())), precision=_HIGHEST)
    y_i = jax.lax.dot_general(
        invd_t[:], acc, (((0,), (0,)), ((), ())), precision=_HIGHEST)
    out[:] = y_i
    y_acc[pl.ds(i * block, block), :] = y_i


def _solve_impl(L, b, block, transposed, interpret):
    n = L.shape[0]
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    m = b.shape[1]
    n_pad = round_up(n, block)
    m_pad = max(round_up(m, 128), 128)
    Lp = _pad_to(_pad_to(L, n_pad, 0), n_pad, 1)
    if n_pad > n:
        # keep padded diagonal blocks invertible
        idx = jnp.arange(n, n_pad)
        Lp = Lp.at[idx, idx].set(1.0)
    nb = n_pad // block
    invd = _diag_block_inverses(Lp, block)

    # tile the RHS axis so the VMEM scratch stays bounded (~4 MB — the
    # full budget is 16 MB and the L row/column block is double-buffered):
    # each m-tile is an independent substitution (parallel grid axis)
    m_tile = min(m_pad, max(128, (2 * 2 ** 20 // (4 * n_pad)) // 128 * 128))
    # the grid must cover EVERY column: round the padded width up to a
    # whole number of tiles (flooring here left the last partial tile's
    # output block unwritten — NaN/garbage columns)
    m_pad = round_up(m_pad, m_tile)
    m_tiles = m_pad // m_tile
    bp_ = _pad_to(_pad_to(b, n_pad, 0), m_pad, 1)

    if not transposed:
        in_specs = [
            pl.BlockSpec((block, n_pad), lambda j, i: (i, 0)),   # L row
            pl.BlockSpec((block, m_tile), lambda j, i: (i, j)),  # b block
            pl.BlockSpec((None, block, block), lambda j, i: (i, 0, 0)),
        ]
        out_specs = pl.BlockSpec((block, m_tile), lambda j, i: (i, j))
        kernel = _fwd_kernel
    else:
        in_specs = [
            # column block of L, iterated bottom-up
            pl.BlockSpec((n_pad, block), lambda j, k: (0, nb - 1 - k)),
            pl.BlockSpec((block, m_tile), lambda j, k: (nb - 1 - k, j)),
            pl.BlockSpec((None, block, block),
                         lambda j, k: (nb - 1 - k, 0, 0)),
        ]
        out_specs = pl.BlockSpec((block, m_tile),
                                 lambda j, k: (nb - 1 - k, j))
        kernel = _bwd_kernel

    x = pl.pallas_call(
        kernel,
        grid=(m_tiles, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), b.dtype),
        scratch_shapes=[pltpu.VMEM((n_pad, m_tile), b.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(Lp, bp_, invd)
    x = x[:n, :m]
    return x[:, 0] if squeeze else x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def tri_solve(L, b, block=256, interpret=False):
    """x = L⁻¹ b by blocked forward substitution (L lower [n,n], b [n] or
    [n,m]). Differentiable; padding handles n, m not multiples of the
    block size. ``interpret=True`` for CPU equivalence tests."""
    return _solve_impl(L, b, block, transposed=False, interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def tri_solve_t(L, c, block=256, interpret=False):
    """y = L⁻ᵀ c by blocked backward substitution (L lower)."""
    return _solve_impl(L, c, block, transposed=True, interpret=interpret)


def _tri_solve_fwd(L, b, block, interpret):
    x = tri_solve(L, b, block, interpret)
    return x, (L, x)


def _tri_solve_bwd(block, interpret, res, x_bar):
    L, x = res
    b_bar = tri_solve_t(L, x_bar, block, interpret)
    outer = (b_bar[:, None] * x[None, :] if x.ndim == 1
             else b_bar @ x.T)
    L_bar = -jnp.tril(outer)
    return L_bar, b_bar


def _tri_solve_t_fwd(L, c, block, interpret):
    y = tri_solve_t(L, c, block, interpret)
    return y, (L, y)


def _tri_solve_t_bwd(block, interpret, res, y_bar):
    L, y = res
    # y = L⁻ᵀ c:  ⟨ȳ, dy⟩ = −yᵀ dL w with w = L⁻¹ ȳ  ⇒  L̄ = −y wᵀ, c̄ = w
    w = tri_solve(L, y_bar, block, interpret)
    outer = (y[:, None] * w[None, :] if y.ndim == 1 else y @ w.T)
    L_bar = -jnp.tril(outer)
    return L_bar, w


tri_solve.defvjp(_tri_solve_fwd, _tri_solve_bwd)
tri_solve_t.defvjp(_tri_solve_t_fwd, _tri_solve_t_bwd)


def solve_chol(L, b, block=256, interpret=False):
    """Solve (L Lᵀ) x = b given the lower Cholesky factor — two blocked
    substitutions (the Pallas twin of ops.linalg.solve_chol)."""
    return tri_solve_t(L, tri_solve(L, b, block, interpret), block,
                       interpret)
