"""Pallas TPU kernels for the GP hot path.

BASELINE.json:5 calls out "the GP regression module's kernel-matrix builds
and Cholesky/triangular solves run as Pallas kernels". The kernel-matrix
build is the O(n²d) op; it decomposes as ‖x‖² + ‖x′‖² − 2 x x′ᵀ
(SURVEY.md §9 step 6), putting the O(n²d) cross term on the MXU. The
Pallas kernel tiles the (n, m) output grid, keeps each (block, K) slab in
VMEM, and fuses the norm/broadcast epilogue — one HBM write for the
result, no materialised intermediate.

An XLA fallback handles CPU tests and small problems; equivalence is
tested in tests/test_gp.py (reference test model: Pallas-vs-XLA
equivalence, SURVEY.md §6 build-side additions).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bipymc_tpu.ops.tiling import round_up

_BLOCK = 256      # output tile (multiple of MXU 128)
_K_ALIGN = 128    # lane alignment for the feature axis



def _sqdist_kernel(a_ref, b_ref, out_ref):
    a = a_ref[:]                                   # [bm, K]
    b = b_ref[:]                                   # [bn, K]
    a_nrm = jnp.sum(a * a, axis=1, keepdims=True)  # [bm, 1]
    b_nrm = jnp.sum(b * b, axis=1, keepdims=True)  # [bn, 1]
    # HIGHEST: full-f32 MXU passes. The default bf16 multiply loses ~1e-2
    # relative, which the ‖a‖²+‖b‖²−2ab cancellation amplifies into
    # absolute distance errors ~0.1 — enough to destroy a GP Gram matrix.
    cross = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)       # a @ bᵀ on the MXU
    out_ref[:] = jnp.maximum(a_nrm + b_nrm.T - 2.0 * cross, 0.0)


@jax.custom_vjp
def _sqdist_pallas(A, B):
    return _sqdist_pallas_fwd(A, B)[0]


def _sqdist_pallas_fwd(A, B):
    return _sqdist_pallas_call(A, B), (A, B)


def _sqdist_pallas_bwd(res, g):
    # r2_ij = Σ_k (A_ik − B_jk)²  ⇒
    #   dA = 2 (A ⊙ Σ_j g_ij − g B),   dB = 2 (B ⊙ Σ_i g_ij − gᵀ A)
    # — matmul-heavy, so the backward pass rides the MXU via XLA.
    # HIGHEST for the same reason as the forward: the TPU-default bf16
    # passes put ~1e-2 relative noise into hyperopt gradients.
    A, B = res
    hi = jax.lax.Precision.HIGHEST
    dA = 2.0 * (A * jnp.sum(g, axis=1)[:, None]
                - jnp.matmul(g, B, precision=hi))
    dB = 2.0 * (B * jnp.sum(g, axis=0)[:, None]
                - jnp.matmul(g.T, A, precision=hi))
    return dA.astype(A.dtype), dB.astype(B.dtype)


_sqdist_pallas.defvjp(_sqdist_pallas_fwd, _sqdist_pallas_bwd)


@functools.partial(jax.jit, static_argnames=("bm", "bn"))
def _sqdist_pallas_call(A, B, bm=_BLOCK, bn=_BLOCK):
    n, k = A.shape
    m, _ = B.shape
    n_p, m_p, k_p = round_up(n, bm), round_up(m, bn), round_up(k, _K_ALIGN)
    # zero padding changes neither norms nor the cross term
    A = jnp.pad(A, ((0, n_p - n), (0, k_p - k)))
    B = jnp.pad(B, ((0, m_p - m), (0, k_p - k)))
    out = pl.pallas_call(
        _sqdist_kernel,
        grid=(n_p // bm, m_p // bn),
        in_specs=[
            pl.BlockSpec((bm, k_p), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k_p), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_p, m_p), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_p * m_p * k_p,
            bytes_accessed=4 * (n_p * k_p + m_p * k_p + n_p * m_p),
            transcendentals=0),
        # the default scoped-VMEM budget is 16MB; two double-buffered
        # [block, k_p] input slabs exceed it for k_p ≳ 4096 (the caller
        # gates the auto-dispatch on the same budget)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(A, B)
    return out[:n, :m]


def _sqdist_xla(A, B):
    a_nrm = jnp.sum(A * A, axis=1, keepdims=True)
    b_nrm = jnp.sum(B * B, axis=1, keepdims=True)
    cross = jnp.matmul(A, B.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(a_nrm + b_nrm.T - 2.0 * cross, 0.0)


def pairwise_sqdist(X, X2=None, use_pallas=None):
    """Pairwise squared Euclidean distances, [n, m].

    Centers the inputs first (distance-invariant) to tame the f32
    cancellation in the ‖·‖² decomposition. ``use_pallas=None`` auto-picks
    the Pallas path on TPU for problems big enough to tile (and whose
    feature-axis slabs fit the raised VMEM budget). float64 inputs (the
    x64 knob — CPU only; the TPU has no f64 datapath) keep their full
    precision on the XLA path instead of being squeezed through f32.
    """
    X2 = X if X2 is None else X2
    mu = jnp.mean(X, axis=0)
    A = X - mu
    B = X2 - mu
    if A.dtype == jnp.float64:
        return _sqdist_xla(A, B)
    A = A.astype(jnp.float32)
    B = B.astype(jnp.float32)
    if use_pallas is None:
        # two double-buffered [block, k_p] f32 input slabs per grid cell
        # must fit the VMEM budget _sqdist_pallas_call requests
        k_p = round_up(X.shape[1], _K_ALIGN)
        slab_bytes = 2 * 2 * _BLOCK * k_p * 4
        use_pallas = (jax.default_backend() == "tpu"
                      and X.shape[0] * X2.shape[0] >= 128 * 128
                      and slab_bytes <= 90 * 1024 * 1024)
    if use_pallas:
        return _sqdist_pallas(A, B)
    return _sqdist_xla(A, B)
