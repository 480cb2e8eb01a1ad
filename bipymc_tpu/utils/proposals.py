"""The pluggable proposal-density interface for global-move MCMC.

A `Proposal` is an exact, normalizable density q the independence-MH
kernel (`samplers/flowmh.py`) can both SAMPLE and EVALUATE. The kernel
needs three things, bundled here:

- ``sample_logq(eps, u) -> (x, log_q(x))``: map a block of standard
  normals ``eps`` [n, d] and uniforms ``u`` [n] to proposals and their
  exact log-density. Taking raw (eps, u) instead of a PRNG key keeps
  the kernel's counter-based word layout intact, so mesh and vmap runs
  consume identical streams (the package-wide bit-identity contract,
  `tests/test_sharding.py`).
- ``log_q(x)``: exact density at arbitrary points (the kernel caches
  it for the CURRENT state and must refresh it after local moves).
- ``sigma`` [d]: the fit's per-dimension marginal scale — the kernel
  reuses it for its local random-walk moves (2.38/√d · σ).

Implementations: `utils/flows.flow_proposal` (RealNVP coupling flow —
warped, non-Gaussian basins) and `utils/mixtures.gmm_proposal`
(EM-fitted Gaussian mixture — Gaussian-ish metastable basins, where a
neural flow's per-dimension fit error compounds with d but a GMM is
the exact family). Any object with these three fields works — the MH
correction guarantees the EXACT posterior regardless of fit quality;
fit quality only moves the acceptance rate.
"""

from typing import Callable, NamedTuple

import jax


class Proposal(NamedTuple):
    sample_logq: Callable  # (eps [n, d], u [n]) -> (x [n, d], lq [n])
    log_q: Callable        # x [..., d] -> [...]
    sigma: jax.Array       # [d] per-dim marginal scale of the fit
