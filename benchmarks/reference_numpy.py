"""Reference-semantics DREAM-zs in pure NumPy — the CPU baseline.

The upstream reference (`wgurecky/bipymc`) publishes no benchmark numbers
(BASELINE.md), so the 50x speed target's denominator must be *measured*:
"single-node MPI reference, 100-dim posterior, 256 DREAM-z chains"
(BASELINE.json:5). This module reimplements the reference's algorithm with
the reference's execution model — a Python loop over generations and over
chains, one NumPy log-likelihood call per chain per generation, a growing
archive list — i.e. what one mpi4py rank does in `bipymc/dream.py` [U]
(SURVEY.md §5.2). The measured single-process ESS/sec is multiplied by the
host's core count as an *optimistic upper bound* on single-node MPI scaling
(perfect linear speedup, zero communication cost), so the reported
vs-baseline ratio understates the true speedup.

Not imported by the framework; used only by bench.py and fidelity tests
(same math as bipymc_tpu.samplers.dream, independently written).
"""

import numpy as np


class NumpyDreamZs:
    """DREAM-zs (Vrugt et al. 2011) with reference execution semantics."""

    def __init__(self, log_prob, n_chains, delta_max=3, n_cr=3,
                 p_snooker=0.1, b=1e-4, b_star=1e-6, jump_interval=5,
                 archive_thin=10, burnin_gens=500, seed=0):
        self.log_prob = log_prob
        self.n_chains = n_chains
        self.delta_max = delta_max
        self.n_cr = n_cr
        self.p_snooker = p_snooker
        self.b = b
        self.b_star = b_star
        self.jump_interval = jump_interval
        self.archive_thin = archive_thin
        self.burnin_gens = burnin_gens
        self.rng = np.random.default_rng(seed)

    def run(self, x0, z0, n_gens, draws=None):
        """x0: [n_chains, d] start; z0: [k, d] archive seed.

        draws: optional injected randomness for exact-fidelity tests
        (SURVEY.md §6 contract (a)): ``draws(gen, i) -> (u_scal [3],
        row_idx [n_rows], cr_idx, u_ue [2, d], eps_n [d], u_acc)`` with
        the same packing as ``bipymc_tpu.samplers.dream.make_step``'s
        draws_fn. Pair layout then matches the JAX engine's fixed slots:
        pair j is (row j, row delta_max + j) for j < delta.

        Returns history [n_gens, n_chains, d].
        """
        rng = self.rng
        x = np.array(x0, dtype=np.float64)
        n, d = x.shape
        logp = np.array([self.log_prob(xi) for xi in x])
        archive = list(np.array(z0, dtype=np.float64))
        cr_p = np.full(self.n_cr, 1.0 / self.n_cr)
        cr_jump = np.zeros(self.n_cr)
        cr_count = np.zeros(self.n_cr)
        logp_sum = np.zeros(n)
        history = np.empty((n_gens, n, d))

        for gen in range(n_gens):
            gamma_jump = (gen % self.jump_interval) == self.jump_interval - 1
            in_burnin = gen < self.burnin_gens
            x_start = x.copy()
            var = np.maximum(np.var(x, axis=0), 1e-30)

            for i in range(n):                       # reference: chain loop
                if draws is None:
                    is_snk = rng.uniform() < self.p_snooker
                    u_gs = rng.uniform()
                    u_delta = None
                else:
                    u_scal, row_idx, cr_inj, u_ue, eps_n, u_acc = \
                        draws(gen, i)
                    is_snk = u_scal[0] < self.p_snooker
                    u_delta = u_scal[1]
                    u_gs = u_scal[2]

                if is_snk:
                    if draws is None:
                        zi = rng.choice(len(archive), 3, replace=False)
                        gs = 1.2 + 1.0 * u_gs
                    else:
                        zi = row_idx[:3]
                        gs = 1.2 + 1.0 * u_gs
                    z, zr1, zr2 = (archive[j] for j in zi)
                    u_dir = x[i] - z
                    denom = max(float(u_dir @ u_dir), 1e-30)
                    proj = lambda v: z + ((v - z) @ u_dir / denom) * u_dir
                    x_star = x[i] + gs * (proj(zr1) - proj(zr2))
                    num = max(float((x_star - z) @ (x_star - z)), 1e-30)
                    log_jac = (d - 1) * 0.5 * (np.log(num) - np.log(denom))
                    cr_idx = None
                else:
                    if draws is None:
                        delta = rng.integers(1, self.delta_max + 1)
                        zi = rng.choice(len(archive), 2 * delta,
                                        replace=False)
                        rows = np.array([archive[j] for j in zi])
                        diff = np.sum(rows[:delta] - rows[delta:], axis=0)
                        cr_idx = rng.choice(self.n_cr, p=cr_p)
                        u = rng.uniform(size=d)
                        e = rng.uniform(-self.b, self.b, size=d)
                        eps = self.b_star * rng.standard_normal(d)
                    else:
                        delta = min(int(1 + u_delta * self.delta_max),
                                    self.delta_max)
                        # fixed pair slots (j, delta_max + j), j < delta —
                        # the JAX engine's layout
                        r1 = np.array([archive[row_idx[j]]
                                       for j in range(delta)])
                        r2 = np.array([archive[row_idx[self.delta_max + j]]
                                       for j in range(delta)])
                        diff = np.sum(r1 - r2, axis=0)
                        cr_idx = int(cr_inj)
                        u = np.asarray(u_ue[0])
                        e = self.b * (2.0 * np.asarray(u_ue[1]) - 1.0)
                        eps = self.b_star * np.asarray(eps_n)
                    cr = (cr_idx + 1) / self.n_cr
                    mask = u < cr
                    mask[np.argmin(u)] = True
                    d_eff = mask.sum()
                    gamma = 1.0 if gamma_jump else 2.38 / np.sqrt(
                        2.0 * delta * d_eff)
                    x_star = x[i] + mask * ((1.0 + e) * gamma * diff + eps)
                    log_jac = 0.0

                lp_star = self.log_prob(x_star)      # dominant cost
                u_accept = rng.uniform() if draws is None else u_acc
                if np.isfinite(lp_star) and np.log(u_accept) < min(
                        0.0, lp_star - logp[i] + log_jac):
                    x[i] = x_star
                    logp[i] = lp_star
                if in_burnin and cr_idx is not None:
                    jump2 = float(np.sum((x[i] - x_start[i]) ** 2 / var))
                    cr_jump[cr_idx] += jump2
                    cr_count[cr_idx] += 1.0

            if in_burnin and cr_count.min() > 4.0:
                rate = cr_jump / np.maximum(cr_count, 1.0)
                if np.all(np.isfinite(rate)) and rate.sum() > 0:
                    cr_p = rate / rate.sum()

            logp_sum += logp
            if in_burnin and gen > 0 and (gen % 10) == 9:
                mean_lp = logp_sum / (gen + 1)
                q1, q3 = np.percentile(mean_lp, [25, 75])
                best = int(np.argmax(logp))
                for i in np.where(mean_lp < q1 - 2.0 * (q3 - q1))[0]:
                    x[i] = x[best]
                    logp[i] = logp[best]
                    logp_sum[i] = logp_sum[best]

            if (gen % self.archive_thin) == self.archive_thin - 1:
                archive.extend(x.copy())
            history[gen] = x
        return history


class NumpyDram:
    """DRAM (Haario et al. 2006) with reference execution semantics.

    Serial Python loop, one likelihood call per stage per step
    (SURVEY.md §5.1); AM covariance from full chain history with
    s_d = 2.38²/d and ε-regularisation (§4.2); two-stage delayed
    rejection with the Green-Mira acceptance ratio — the q₁ terms do
    NOT cancel (§4.3).
    """

    def __init__(self, log_prob, adapt_start=100, adapt_interval=50,
                 eps=1e-8, kappa=5.0, seed=0):
        self.log_prob = log_prob
        self.adapt_start = adapt_start
        self.adapt_interval = adapt_interval
        self.eps = eps
        self.kappa = kappa
        self.rng = np.random.default_rng(seed)

    @staticmethod
    def _log_q(x, mean, cov_inv, log_det):
        r = x - mean
        return -0.5 * (r @ cov_inv @ r + log_det)

    def run(self, x0, n_steps, cov0=None, draws=None):
        """draws: optional injected randomness for exact-fidelity tests:
        ``draws(t) -> (z1 [d], z2 [d], u1, u2)`` — stage-1/-2 standard
        normals and accept uniforms, same packing as
        ``bipymc_tpu.samplers.rw.make_step``'s draws_fn."""
        rng = self.rng
        x = np.array(x0, dtype=np.float64)
        d = x.size
        s_d = 2.38 ** 2 / d
        cov = np.array(cov0) if cov0 is not None else np.eye(d)
        chol = np.linalg.cholesky(cov)
        lp = self.log_prob(x)
        history = np.empty((n_steps, d))
        # inv/log_det change only when cov adapts — computing them per
        # step inflated the baseline's cost (and thus the speedup ratio)
        cov_inv = np.linalg.inv(cov)
        log_det = 2.0 * np.sum(np.log(np.diag(chol)))

        for t in range(n_steps):
            if draws is None:
                z1, z2 = rng.standard_normal(d), None
                u1, u2 = rng.uniform(), None
            else:
                z1, z2, u1, u2 = draws(t)
            y1 = x + chol @ z1
            lp1 = self.log_prob(y1)
            a1 = min(0.0, lp1 - lp)                     # log α₁(x, y₁)
            # guard non-finite proposals: Python's min(0.0, nan) is 0.0,
            # which would ACCEPT — the JAX path rejects via NaN compares
            if np.isfinite(lp1) and np.log(u1) < a1:
                x, lp = y1, lp1
            else:
                if draws is None:
                    z2, u2 = rng.standard_normal(d), rng.uniform()
                y2 = x + (chol / np.sqrt(self.kappa)) @ z2
                lp2 = self.log_prob(y2)
                a1_rev = min(0.0, lp1 - lp2)            # log α₁(y₂, y₁)
                lq_num = self._log_q(y1, y2, cov_inv, log_det)
                lq_den = self._log_q(y1, x, cov_inv, log_det)
                with np.errstate(divide="ignore"):
                    log_a2 = (lp2 + lq_num + np.log1p(-np.exp(a1_rev))
                              - lp - lq_den - np.log1p(-np.exp(a1)))
                if np.isfinite(log_a2) and \
                        np.log(u2) < min(0.0, log_a2):
                    x, lp = y2, lp2
            history[t] = x

            if t >= self.adapt_start and \
                    (t + 1) % self.adapt_interval == 0:
                # include x0: Haario's recursion folds the initial state
                # into the covariance (matches the JAX Welford carry)
                visited = np.vstack([np.asarray(x0, dtype=np.float64)[None],
                                     history[: t + 1]])
                c = s_d * (np.cov(visited.T) + self.eps * np.eye(d))
                try:
                    chol_new = np.linalg.cholesky(c)
                    cov, chol = c, chol_new
                    cov_inv = np.linalg.inv(cov)
                    log_det = 2.0 * np.sum(np.log(np.diag(chol)))
                except np.linalg.LinAlgError:
                    pass
        return history


def mixture_log_prob_numpy(means, sigma=1.0):
    """NumPy twin of bipymc_tpu.models.targets.gaussian_mixture."""
    means = np.asarray(means, dtype=np.float64)
    k, d = means.shape
    log_w = -np.log(k)
    norm = -0.5 * d * np.log(2.0 * np.pi * sigma ** 2)

    def log_prob(theta):
        sq = np.sum((theta[None, :] - means) ** 2, axis=-1)
        a = log_w + norm - 0.5 * sq / sigma ** 2
        m = a.max()
        return m + np.log(np.exp(a - m).sum())

    return log_prob
