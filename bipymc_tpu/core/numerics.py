"""Shared scalar numerics used by more than one engine.

Helpers here are plain elementwise jnp — safe under jit/vmap/scan AND
inside Pallas kernel bodies (Mosaic-supported ops only). Sharing one
definition is load-bearing for the fused engines' bit-parity contracts:
the per-step and fused RW engines must evaluate the Green–Mira
acceptance with the *same* floating-point formula, so a numerical tweak
must reach both at once (tests/test_fused_rw.py pins the agreement).
"""

import jax.numpy as jnp


def log1mexp(log_a):
    """log(1 − exp(log_a)) for log_a ≤ 0, numerically stable (Mächler 2012)."""
    log_a = jnp.minimum(log_a, -1e-30)  # exact 0 → well-defined -inf-ish
    return jnp.where(
        log_a > -0.6931471805599453,          # −log 2
        jnp.log(-jnp.expm1(log_a)),
        jnp.log1p(-jnp.exp(log_a)),
    )
