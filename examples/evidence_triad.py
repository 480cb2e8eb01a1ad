"""The evidence toolkit: one model, four estimators, one analytic answer.

The framework prices the marginal likelihood log Z = log ∫ p(θ)·L(θ) dθ
four structurally different ways:

  1. SMC (bp.Smc)                  — anneal a population prior→posterior
                                     once; Z from the telescoped
                                     normalising increments.
  2. Nested sampling (bp.NestedSampler) — integrate L over prior volume;
                                     Z with the √(H/K) error bar.
  3. Power-posterior PT (bp.power_posterior_evidence) — STATIONARY
                                     tempered chains at fixed rungs;
                                     thermodynamic integration AND
                                     stepping-stone from the same run,
                                     plus converged posterior draws at
                                     the β=1 rung for free.
  4. Bridge sampling (bp.bridge_evidence) — no extra sampling pass at
                                     all: the optimal-bridge fixed
                                     point from an ordinary MCMC run's
                                     draws + one batch of moment-
                                     matched Gaussian proposal evals.

Conjugate Gaussian model (prior N(0, τ²I), likelihood N(y₀|θ, σ²I)) so
log Z = log N(y₀; 0, (τ²+σ²)I) is exact and every estimator is pinned
against the truth, not against each other.

Beyond-reference example (the reference has no evidence estimation);
run directly: ``python examples/evidence_triad.py``.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

import bipymc_tpu as bp

D, TAU, SIG = 4, 2.0, 1.0
Y0 = np.asarray([0.8, -1.2, 0.4, 1.6], np.float32)


def log_prior(th):
    return (-0.5 * jnp.sum(th ** 2) / TAU ** 2
            - 0.5 * D * math.log(2 * math.pi * TAU ** 2))


def log_like(th):
    return (-0.5 * jnp.sum((jnp.asarray(Y0) - th) ** 2) / SIG ** 2
            - 0.5 * D * math.log(2 * math.pi * SIG ** 2))


def main():
    v = TAU ** 2 + SIG ** 2
    truth = float(-0.5 * np.sum(Y0 ** 2) / v
                  - 0.5 * D * math.log(2 * math.pi * v))

    # -- 1. SMC: reference = the (normalised) prior, target = posterior
    smc = bp.Smc(lambda th: log_prior(th) + log_like(th),
                 n_particles=4096, seed=0,
                 log_ref=log_prior,
                 sample_ref=lambda key, n: TAU * jax.random.normal(
                     key, (n, D)),
                 ess_alpha=0.9)
    smc_info = smc.run()
    z_smc = float(smc_info["log_evidence"])

    # -- 2. NS: Gaussian prior through the unit-cube transform
    ns = bp.NestedSampler(
        log_like,
        prior_transform=lambda u: TAU * jax.scipy.special.ndtri(
            jnp.clip(u, 1e-7, 1 - 1e-7)),
        n_dim=D, n_live=512, n_batch=32, n_mcmc=8, seed=0)
    ns_info = ns.run()
    z_ns, ns_err = (float(ns_info["log_evidence"]),
                    float(ns_info["log_evidence_err"]))

    # -- 3. Power-posterior PT: TI + stepping stone from one ladder run
    # 32 chains per rung: the β=1 posterior check below reads the FINAL
    # generation's ensemble mean, whose per-dim SE is σ_post/√n_chains —
    # at the tiled default of 8 chains that is 0.17 and the old 0.6 band
    # sat at 3.5σ (this seed deterministically missed it; round-4
    # example sweep). 32 chains put the band at ~5σ.
    r = bp.power_posterior_evidence(log_prior, log_like,
                                    jnp.zeros((32, D)),
                                    n_temps=8, n_gens=4000, seed=0)

    # -- 4. Bridge sampling: evidence from draws you ALREADY have —
    #       here an ordinary DRAM run's history, no ladder/anneal pass
    post = bp.Dram(lambda th: log_prior(th) + log_like(th),
                   n_chains=8, seed=0)
    post.run_mcmc(2000, jnp.zeros(D), cov_est=jnp.eye(D))
    br = bp.bridge_evidence(post.super_chain[:, 500::5],
                            lambda th: log_prior(th) + log_like(th))

    print(f"analytic            log Z = {truth:+.3f}")
    print(f"SMC                 log Z = {z_smc:+.3f}  "
          f"(stages {int(smc_info['n_stages'])})")
    print(f"nested sampling     log Z = {z_ns:+.3f} ± {ns_err:.3f}")
    print(f"PT thermo. integr.  log Z = {r.log_z_ti:+.3f} "
          f"± {r.mcse_ti:.3f} (mcse, iid approx)")
    print(f"PT stepping stone   log Z = {r.log_z_ss:+.3f}")
    print(f"PT swap rates: {np.round(r.swap_rate, 2)}")
    print(f"bridge sampling     log Z = {br.log_z:+.3f}  "
          f"(re ~ {np.sqrt(br.re2):.4f}, {br.n_iter} iters, "
          f"from plain DRAM draws)")

    for name, z in [("smc", z_smc), ("ns", z_ns),
                    ("ti", r.log_z_ti), ("ss", r.log_z_ss),
                    ("bridge", br.log_z)]:
        assert abs(z - truth) < 0.4, (name, z, truth)
    assert abs(z_ns - truth) < 3.5 * ns_err

    # the β=1 rung of the PT run doubles as a posterior sample
    post_mean = Y0 * TAU ** 2 / v
    post_sd = float(np.sqrt(1.0 / (1.0 / TAU ** 2 + 1.0 / SIG ** 2)))
    cold = np.asarray(r.state.kernel.theta[0])        # [n_chains, d]
    err = np.abs(cold.mean(axis=0) - post_mean).max()
    band = 5.0 * post_sd / np.sqrt(cold.shape[0])     # 5σ of the mean
    print(f"PT β=1 rung posterior-mean max abs err: {err:.3f} "
          f"(band {band:.3f})")
    assert err < band, (err, band)
    print("evidence triad agrees with the analytic log Z")


if __name__ == "__main__":
    main()
