"""Constrained-parameter transforms — run any sampler in unconstrained
space.

Beyond-reference extra (the reference's bounded physics parameters are
handled by returning -inf outside the box, which random-walk samplers
tolerate but gradient samplers (HMC/NUTS/MALA), ADVI and SVGD cannot:
the gradient is zero/undefined off-support and trajectories stall at the
boundary). The fix is the standard Stan/ADVI change of variables
(Kucukelbir et al. 2017 §2.1): map each bounded coordinate to ℝ, add the
log-Jacobian, sample in u-space, push samples back through ``forward``.

Per-dimension maps, chosen automatically from the finiteness of the
bounds (all static at build time — the compiled function is branchless):

    (-inf, inf):  θ = u                        log|dθ/du| = 0
    (lo,   inf):  θ = lo + exp(u)              log|dθ/du| = u
    (-inf, hi):   θ = hi − exp(u)              log|dθ/du| = u
    (lo,   hi):   θ = lo + (hi−lo)·σ(u)        log|dθ/du| =
                                    log(hi−lo) + logσ(u) + logσ(−u)

Everything broadcasts over leading axes, so ``forward`` maps a whole
[n_chains, T, d] history in one call and ``log_det`` returns the
matching [...] batch of scalars.

Usage (any sampler in the zoo):

    t = bp.constrain(lower=[0.0, 0.0], upper=[jnp.inf, 1.0])
    s = bp.Hmc(bp.transform_log_prob(log_prob, t), ...)
    s.run_mcmc(n, t.inverse(theta_0_constrained))
    theta = t.forward(s.get_chain(flat=True))
"""

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Transform(NamedTuple):
    """u ∈ ℝᵈ ↔ θ ∈ support; ``log_det`` is log|det dθ/du| at u."""

    forward: Callable   # u [..., d] -> theta [..., d]
    inverse: Callable   # theta [..., d] -> u [..., d]
    log_det: Callable   # u [..., d] -> [...] (sum over the last axis)
    d: int


def _log_sigmoid(x):
    # log σ(x) = -softplus(-x), stable both tails
    return -jnp.logaddexp(-x, 0.0)


def constrain(lower=None, upper=None, d=None) -> Transform:
    """Build the automatic unconstraining transform for box bounds.

    lower/upper: scalars or length-d sequences; ``None``/±inf entries
    mean unbounded on that side. ``d`` is required only when both
    bounds are scalar/None. Bounds are static — baked into the
    compiled functions as masks, no runtime branching.
    """
    if lower is None and upper is None and d is None:
        raise ValueError("pass d= when both bounds are None")
    lo = np.asarray(-np.inf if lower is None else lower, np.float64)
    hi = np.asarray(np.inf if upper is None else upper, np.float64)
    if d is None:
        d = max(lo.size, hi.size)
    lo = np.broadcast_to(lo, (d,)).copy()
    hi = np.broadcast_to(hi, (d,)).copy()
    if np.any(~(lo < hi)):
        raise ValueError(f"need lower < upper elementwise; got {lo} !< {hi}")

    has_lo = np.isfinite(lo)
    has_hi = np.isfinite(hi)
    box = has_lo & has_hi          # logit map
    one_sided = has_lo ^ has_hi    # exp map
    free = ~(has_lo | has_hi)      # identity
    # exp map: theta = anchor + sign*exp(u); sign -1 for upper-only
    anchor = np.where(has_lo, lo, np.where(has_hi, hi, 0.0))
    sign = np.where(has_hi & ~has_lo, -1.0, 1.0)
    width = np.where(box, hi - lo, 1.0)       # safe off-box
    log_width = np.log(width)

    def _consts(dtype):
        c = lambda a: jnp.asarray(a, dtype)
        return (c(anchor), c(sign), c(width), c(log_width),
                c(free), c(one_sided), c(box))

    def forward(u):
        u = jnp.asarray(u)
        anc, sg, w, _, m_free, m_one, m_box = _consts(u.dtype)
        # guard exp's argument on dims where the map doesn't apply: a
        # FREE dim with |u| > 88 would otherwise overflow exp to inf in
        # f32 and 0·inf = NaN leaks through the mask arithmetic
        th_one = anc + sg * jnp.exp(jnp.where(m_one > 0, u, 0.0))
        th_box = anc + w * jax.nn.sigmoid(u)
        return m_free * u + m_one * th_one + m_box * th_box

    def inverse(theta):
        theta = jnp.asarray(theta)
        anc, sg, w, _, m_free, m_one, m_box = _consts(theta.dtype)
        # guard the logs' arguments on dims where the map doesn't apply
        r_one = jnp.where(m_one > 0, sg * (theta - anc), 1.0)
        u_one = jnp.log(r_one)
        p = jnp.where(m_box > 0, (theta - anc) / w, 0.5)
        u_box = jnp.log(p) - jnp.log1p(-p)
        return m_free * theta + m_one * u_one + m_box * u_box

    def log_det(u):
        u = jnp.asarray(u)
        _, _, _, lw, _, m_one, m_box = _consts(u.dtype)
        per_dim = (m_one * u
                   + m_box * (lw + _log_sigmoid(u) + _log_sigmoid(-u)))
        return jnp.sum(per_dim, axis=-1)

    return Transform(forward=forward, inverse=inverse, log_det=log_det,
                     d=int(d))


def transform_log_prob(log_prob: Callable, t: Transform) -> Callable:
    """Unconstrained-space density: lp_u(u) = lp(forward(u)) + log_det(u).

    The returned callable has the same [d]->[] contract every sampler in
    the package consumes (and is `jax.grad`-able whenever ``log_prob``
    is, since the transform is smooth)."""

    def lp_u(u):
        return log_prob(t.forward(u)) + t.log_det(u)

    return lp_u
