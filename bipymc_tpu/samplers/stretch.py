"""Affine-invariant ensemble sampler (Goodman & Weare 2010 stretch move).

Beyond-reference extra (emcee [P] is the design precedent listed in
PAPERS.md): the stretch move is the most widely used ensemble proposal in
astrophysics and composes naturally with this framework's chain-axis
design. Parallelisation follows emcee v3's red-black scheme: the ensemble
splits into two halves, and each half updates *simultaneously* using
complementary walkers drawn from the other half — which preserves detailed
balance where a fully synchronous all-at-once update would not.

Stretch move (``move="stretch"``): for walker x_i and complementary
walker x_j,
  z ~ g(z) ∝ 1/√z on [1/a, a]   (sampled as z = ((a−1)u + 1)² / a),
  x* = x_j + z (x_i − x_j),
  accept with probability min{1, z^{d−1} π(x*)/π(x_i)}.

Walk move (``move="walk"``, emcee WalkMove with its default
s = whole complementary ensemble): x* = x_i + L ξ with ξ ~ N(0, I_d)
and L Lᵀ the complementary half's sample covariance — a symmetric
proposal (the covariance is a function of the frozen half only), so
plain Metropolis acceptance. Heavier per generation than the stretch
(one d×d Cholesky per half-update) but adapts to anisotropic targets
without the a-tuning question; still affine-invariant.

State is chain-sharded over the mesh like the DE family; the only
collective is the all_gather making the opposite half visible
(SURVEY.md §3.2 pattern).
"""

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from bipymc_tpu.core.rng import bits_to_uniform

from bipymc_tpu.parallel.collectives import all_gather_chains, chain_offset


class StretchConfig(NamedTuple):
    n_chains: int              # total walkers (even; ≥ 2d+2 recommended)
    a: float = 2.0             # stretch scale (move="stretch" only)
    move: str = "stretch"      # "stretch" | "walk" (emcee WalkMove)


class StretchState(NamedTuple):
    x: jax.Array       # [n_local, d] walker positions (chain-sharded)
    logp: jax.Array    # [n_local]
    gen: jax.Array     # [] int32


class StretchInfo(NamedTuple):
    accepted: jax.Array
    logp: jax.Array


def init(x0: jax.Array, log_prob: Callable) -> StretchState:
    logp = jax.vmap(log_prob)(x0)
    return StretchState(x=x0, logp=logp, gen=jnp.zeros((), jnp.int32))


def make_step(log_prob: Callable, cfg: StretchConfig,
              axis_name=None) -> Callable:
    """One generation = two half-updates (red then black)."""
    n_total = cfg.n_chains
    if n_total % 2 != 0:
        raise ValueError("stretch move needs an even number of walkers")
    half = n_total // 2

    def _propose(bits, x_i, x_full, update_first_half):
        # bits: [3] uint32 — one bits block per walker instead of
        # split(3) + three draw kernels (launch-latency economy, core/rng)
        j = (bits[0] & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32) % half
        # complementary walker from the OTHER half
        j = jnp.where(update_first_half, half + j, j)
        x_j = x_full[j]
        u2 = bits_to_uniform(bits[1:], x_i.dtype)
        z = ((cfg.a - 1.0) * u2[0] + 1.0) ** 2 / cfg.a
        x_star = x_j + z * (x_i - x_j)
        log_u = jnp.log(u2[1])
        return x_star, z, log_u

    def _accept(x_star, z, log_u, logp, logp_star, d):
        d_f = jnp.asarray(d, x_star.dtype)
        log_alpha = (d_f - 1.0) * jnp.log(z) + logp_star - logp
        log_alpha = jnp.where(jnp.isfinite(logp_star),
                              jnp.minimum(0.0, log_alpha), -jnp.inf)
        return log_u < log_alpha

    def half_update(x, logp, key, update_first_half):
        """Update one half against the frozen other half.

        Single-device path: the active half is a *static* contiguous slice
        of the walker axis, so only its n/2 likelihoods are evaluated
        (emcee's red-black economy). The per-walker RNG folds by global
        walker index, so trajectories are identical to the masked form.
        """
        n_local, d = x.shape

        if axis_name is None:
            sl = slice(0, half) if update_first_half else slice(half, n_total)
            i_global = sl.start + jnp.arange(half, dtype=jnp.int32)
            blk = jax.vmap(lambda i: jax.random.bits(
                jax.random.fold_in(key, i), (3,), jnp.uint32))(i_global)
            x_star, z, log_u = jax.vmap(
                lambda b, xi: _propose(b, xi, x, update_first_half)
            )(blk, x[sl])
            logp_star = jax.vmap(log_prob)(x_star)          # n/2 evals
            acc_h = _accept(x_star, z, log_u, logp[sl], logp_star, d)
            x = x.at[sl].set(jnp.where(acc_h[:, None], x_star, x[sl]))
            logp = logp.at[sl].set(jnp.where(acc_h, logp_star, logp[sl]))
            acc = jnp.zeros((n_local,), bool).at[sl].set(acc_h)
            return x, logp, acc

        # Mesh path: each device holds a contiguous walker block that may
        # lie in either half, and SPMD forbids per-device control flow —
        # so every device evaluates its whole local block and masks the
        # inactive half (2x likelihood evals per generation; wall-clock
        # per half-update is n_local evals either way once devices align
        # with halves).
        x_full = all_gather_chains(x, axis_name)            # [N, d]
        offset = chain_offset(n_local, axis_name)
        i_global = offset + jnp.arange(n_local, dtype=jnp.int32)
        in_half = (i_global < half) == update_first_half    # [n_local] bool

        blk = jax.vmap(lambda i: jax.random.bits(
            jax.random.fold_in(key, i), (3,), jnp.uint32))(i_global)
        x_star, z, log_u = jax.vmap(
            lambda b, xi: _propose(b, xi, x_full, update_first_half)
        )(blk, x)
        logp_star = jax.vmap(log_prob)(x_star)
        acc = in_half & _accept(x_star, z, log_u, logp, logp_star, d)
        return (jnp.where(acc[:, None], x_star, x),
                jnp.where(acc, logp_star, logp), acc)

    def _comp_chol(comp):
        """Cholesky of the complementary half's sample covariance.

        One d×d factorization per half-update, shared by every active
        walker (emcee WalkMove with its default s = the whole
        complementary ensemble — the subset-free case is deterministic,
        so no per-walker index sampling is needed). Trace-scaled jitter
        keeps a rank-deficient ensemble (n/2 < d walkers, or burn-in
        collapse onto a subspace) factorable: the proposal degrades to a
        small isotropic kick instead of NaN-ing the chain.
        """
        mu = jnp.mean(comp, axis=0)
        c = comp - mu
        d = comp.shape[1]
        cov = c.T @ c / jnp.asarray(comp.shape[0] - 1, comp.dtype)
        jitter = 1e-6 * (jnp.trace(cov) / d) + 1e-12
        return jnp.linalg.cholesky(
            cov + jitter * jnp.eye(d, dtype=cov.dtype))

    def _walk_draw(key, i_global, d, dtype):
        # per-walker key folded by GLOBAL index: mesh and vmap paths
        # consume identical streams (the stretch move's contract)
        def draw(i):
            k = jax.random.fold_in(key, i)
            kx, ku = jax.random.split(k)
            return (jax.random.normal(kx, (d,), dtype),
                    jax.random.uniform(ku, dtype=dtype))
        return jax.vmap(draw)(i_global)

    def walk_half_update(x, logp, key, update_first_half):
        """emcee WalkMove half-update: x* = x_i + L ξ, ξ ~ N(0, I_d),
        L Lᵀ = Cov(complementary half). The covariance depends only on
        the frozen half, so the proposal is symmetric in (x_i, x*) and
        the red-black detailed-balance argument carries over unchanged;
        acceptance is plain Metropolis.
        """
        n_local, d = x.shape

        if axis_name is None:
            sl = slice(0, half) if update_first_half else slice(half, n_total)
            comp = x[half:] if update_first_half else x[:half]
            l_fac = _comp_chol(comp)
            i_global = sl.start + jnp.arange(half, dtype=jnp.int32)
            xi, u = _walk_draw(key, i_global, d, x.dtype)
            x_star = x[sl] + xi @ l_fac.T
            logp_star = jax.vmap(log_prob)(x_star)          # n/2 evals
            log_alpha = jnp.where(jnp.isfinite(logp_star),
                                  jnp.minimum(0.0, logp_star - logp[sl]),
                                  -jnp.inf)
            acc_h = jnp.log(u) < log_alpha
            x = x.at[sl].set(jnp.where(acc_h[:, None], x_star, x[sl]))
            logp = logp.at[sl].set(jnp.where(acc_h, logp_star, logp[sl]))
            acc = jnp.zeros((n_local,), bool).at[sl].set(acc_h)
            return x, logp, acc

        x_full = all_gather_chains(x, axis_name)            # [N, d]
        offset = chain_offset(n_local, axis_name)
        i_global = offset + jnp.arange(n_local, dtype=jnp.int32)
        in_half = (i_global < half) == update_first_half
        comp = x_full[half:] if update_first_half else x_full[:half]
        l_fac = _comp_chol(comp)
        xi, u = _walk_draw(key, i_global, d, x.dtype)
        x_star = x + xi @ l_fac.T
        logp_star = jax.vmap(log_prob)(x_star)
        log_alpha = jnp.where(jnp.isfinite(logp_star),
                              jnp.minimum(0.0, logp_star - logp),
                              -jnp.inf)
        acc = in_half & (jnp.log(u) < log_alpha)
        return (jnp.where(acc[:, None], x_star, x),
                jnp.where(acc, logp_star, logp), acc)

    if cfg.move not in ("stretch", "walk"):
        raise ValueError(f"unknown ensemble move {cfg.move!r}: "
                         "expected 'stretch' or 'walk'")
    update = half_update if cfg.move == "stretch" else walk_half_update

    def step(state: StretchState, key: jax.Array, t: jax.Array):
        k1, k2 = jax.random.split(key)
        x, logp, acc1 = update(state.x, state.logp, k1, True)
        x, logp, acc2 = update(x, logp, k2, False)
        new_state = StretchState(x=x, logp=logp, gen=state.gen + 1)
        return new_state, StretchInfo(accepted=acc1 | acc2, logp=logp)

    return step
