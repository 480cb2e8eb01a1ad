"""Streaming (on-device) Gelman-Rubin for R̂-based early stopping.

BASELINE config 5 requires "on-device Gelman-Rubin stopping": the run must
terminate when R̂ < tol without streaming history to the host. Per-chain
Welford moments (count, mean, M2 per dimension) ride in the scan carry;
cross-chain reductions all_gather the per-chain moments and reduce over
the full chain axis (the gather-then-reduce rule, docs/design.md §3) —
the whole stopping rule evaluates inside the compiled ``while_loop``
(SURVEY.md §7.5, §9 "Host-free stopping").

This is the classic (non-split) R̂ over the monitored window; the post-hoc
:func:`bipymc_tpu.utils.diagnostics.gelman_rubin` on saved history is the
split variant.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bipymc_tpu.parallel.collectives import all_gather_chains


class RhatCarry(NamedTuple):
    n: jax.Array      # [] float — samples folded in per chain
    mean: jax.Array   # [n_local, d] per-chain running mean
    m2: jax.Array     # [n_local, d] per-chain running Σ(x−μ)²


def rhat_init(n_local, d, dtype=jnp.float32) -> RhatCarry:
    return RhatCarry(
        n=jnp.zeros((), dtype),
        mean=jnp.zeros((n_local, d), dtype),
        m2=jnp.zeros((n_local, d), dtype))


def rhat_update(carry: RhatCarry, x) -> RhatCarry:
    """Fold one population snapshot x [n_local, d] into the moments."""
    n = carry.n + 1.0
    delta = x - carry.mean
    mean = carry.mean + delta / n
    m2 = carry.m2 + delta * (x - mean)
    return RhatCarry(n=n, mean=mean, m2=m2)


def rhat_update_block(carry: RhatCarry, xs) -> RhatCarry:
    """Fold a whole block xs [T, n_local, d] into the moments at once
    (Chan et al. pairwise merge — exact up to float re-association with
    T sequential :func:`rhat_update` calls). Used by the fused-engine
    ``run_until`` path, where a chunk's positions arrive as one history
    block instead of one snapshot per step."""
    t = jnp.asarray(xs.shape[0], carry.mean.dtype)
    bmean = jnp.mean(xs, axis=0)
    bm2 = jnp.sum((xs - bmean[None]) ** 2, axis=0)
    n = carry.n + t
    delta = bmean - carry.mean
    # carry.n == 0 (fresh/reset window) must reduce to the block moments
    mean = carry.mean + delta * (t / n)
    m2 = carry.m2 + bm2 + delta ** 2 * (carry.n * t / n)
    return RhatCarry(n=n, mean=mean, m2=m2)


def rhat_merge(a: RhatCarry, b: RhatCarry) -> RhatCarry:
    """Merge two moment carries (Chan et al. pairwise combine).

    Equal to folding b's underlying samples into a, up to float
    re-association. Lets a fused multi-generation runner fold its own
    blocks internally (``make_chunk_runner(collect="rhat")``) and hand
    back ONE carry instead of a [T, n, d] position history.
    """
    n = a.n + b.n
    delta = b.mean - a.mean
    frac = jnp.where(n > 0, b.n / jnp.maximum(n, 1.0), 0.0)
    mean = a.mean + delta * frac
    m2 = a.m2 + b.m2 + delta ** 2 * (a.n * frac)
    return RhatCarry(n=n, mean=mean, m2=m2)


def rhat_compute(carry: RhatCarry, n_chains, axis_name=None):
    """R̂ per dimension [d] from the streamed moments.

    Cross-shard reductions all_gather the per-chain moments and apply
    the identical full-axis reduce the single-device path runs — psum of
    per-device partial sums has a different float association, which
    would let the mesh path's R̂ (and therefore a while_loop stopping
    decision sitting exactly at the tolerance) drift from the
    single-device run it is pinned against. The gather is [N, d] once
    per chunk — noise next to the chunk itself.
    """
    n = jnp.maximum(carry.n, 2.0)
    m = jnp.asarray(n_chains, carry.mean.dtype)
    m2_all = all_gather_chains(carry.m2, axis_name)      # [N, d]
    mean_all = all_gather_chains(carry.mean, axis_name)  # [N, d]
    w = jnp.sum(m2_all, axis=0) / (m * (n - 1.0))
    gmean = jnp.sum(mean_all, axis=0) / m
    b_over_n = jnp.sum((mean_all - gmean) ** 2, axis=0) / (m - 1.0)
    v_hat = (n - 1.0) / n * w + b_over_n
    return jnp.sqrt(v_hat / jnp.maximum(w, 1e-30))
