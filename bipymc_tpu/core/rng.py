"""RNG key discipline.

The reference seeds one NumPy ``RandomState`` per chain (SURVEY.md §2 L2
"seeded per-chain RNG"). The TPU-native equivalent is JAX's counter-based
PRNG with deterministic *folding*: every (step, chain) pair gets an
independent stream derived from one base key, so

- results are reproducible given the seed,
- chain ``i``'s stream does not depend on how many chains run (chain-count
  invariance — required for the vmap path and the shard_map path to agree),
- no RNG state needs to be gathered/broadcast across devices.
"""

import jax


def step_key(base_key, step):
    """Key for global (population-level) randomness at a given step."""
    return jax.random.fold_in(base_key, step)


def chain_key(base_key, step, chain):
    """Key for chain-local randomness at (step, chain).

    ``chain`` must be the *global* chain index (shard offset + local index)
    so the sharded and single-device paths produce identical streams.
    """
    return jax.random.fold_in(jax.random.fold_in(base_key, step), chain)
