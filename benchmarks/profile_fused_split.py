#!/usr/bin/env python
"""Split the fused-engine per-generation cost: kernel+DMA vs XLA prep.

Times (a) the full chunk runner (prep + distinct-idx + gather + kernel +
append) and (b) a scan that re-launches ONLY fused_chunk_pallas on fixed
pregenerated inputs (carry-fed x so nothing hoists). The difference is
the XLA-side per-chunk work. Guides whether in-kernel RNG (eliminating
the u_mask/u_e/eps streams and their prep) can pay. One process,
interleaved best-of-3. Writes benchmarks/fused_split.json.
"""

import json
import os
import signal
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bipymc_tpu.ops.fused_chunk import fused_chunk_pallas, \
    block_logp_from_scalar
from bipymc_tpu.samplers.dream_fused import make_chunk_runner
from benchmarks.profile_fused_chunk import setup, GENS, log

HERE = os.path.dirname(os.path.abspath(__file__))


def measure(n_chains, best_of=3):
    lp, cfg, state0, k_run = setup(n_chains)
    G = cfg.archive_thin
    n_chunks = GENS // G
    d = state0.x.shape[1]
    n_rows = max(2 * cfg.delta_max, 3)
    lp_block = block_logp_from_scalar(lp, d)

    runner = make_chunk_runner(lp, cfg, collect="stats")
    jr = jax.jit(lambda s, k, t: runner(s, k, GENS, t)[0].logp)

    # fixed prepped inputs for one chunk (shapes as dream_fused builds)
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    rows = jax.random.normal(ks[0], (G, n_chains, n_rows, d), jnp.float32)
    u_mask = jax.random.uniform(ks[1], (G, n_chains, d))
    u_e = jax.random.uniform(ks[2], (G, n_chains, d))
    eps = 1e-3 * jax.random.normal(ks[3], (G, n_chains, d))
    scal = jnp.stack([
        jnp.full((G, n_chains), 1.0),                     # delta
        jnp.full((G, n_chains), 0.66),                    # cr
        jnp.full((G, n_chains), 1.7),                     # gamma_s
        jnp.zeros((G, n_chains)),                         # snooker off
        jnp.zeros((G, n_chains)),                         # no jump
        jnp.log(jax.random.uniform(ks[4], (G, n_chains))),
    ], axis=-1)

    def kernel_only(x0, logp0):
        def body(carry, _):
            x, lpv = carry
            xh, lph, _ = fused_chunk_pallas(
                x, lpv, rows, u_mask, u_e, eps, scal, lp_block,
                n_pairs=cfg.delta_max, d_true=d, b=cfg.b,
                b_star=cfg.b_star, interpret=False)
            return (xh[-1], lph[-1]), None
        (x, lpv), _ = lax.scan(body, (x0, logp0), None, length=n_chunks)
        return lpv

    jk = jax.jit(kernel_only)

    st = state0
    t0 = time.time()
    st_lp = jax.block_until_ready(jr(state0, k_run, jnp.int32(0)))
    log(f"  runner compile+warm {time.time()-t0:.1f}s")
    t0 = time.time()
    out = jax.block_until_ready(jk(state0.x, state0.logp))
    log(f"  kernel-only compile+warm {time.time()-t0:.1f}s")

    best = {"full": np.inf, "kernel": np.inf}
    for r in range(best_of):
        t0 = time.time()
        for c in range(4):
            o = jr(state0, jax.random.fold_in(k_run, c), jnp.int32(GENS))
        jax.block_until_ready(o)
        full = (time.time() - t0) / (4 * GENS)
        t0 = time.time()
        for c in range(4):
            o = jk(state0.x + c * 1e-6, state0.logp)
        jax.block_until_ready(o)
        kern = (time.time() - t0) / (4 * GENS)
        log(f"  rep {r}: full {full*1e6:.2f} us/gen, "
            f"kernel-only {kern*1e6:.2f} us/gen")
        best["full"] = min(best["full"], full)
        best["kernel"] = min(best["kernel"], kern)
    return {"n_chains": n_chains,
            "full_us_per_gen": best["full"] * 1e6,
            "kernel_only_us_per_gen": best["kernel"] * 1e6,
            "xla_side_us_per_gen": (best["full"] - best["kernel"]) * 1e6}


def main():
    signal.signal(signal.SIGALRM,
                  lambda *a: (log("watchdog: hung — abort"), os._exit(3)))
    signal.alarm(120)
    log("backend:", jax.default_backend(), jax.devices())
    np.asarray(jnp.ones(()))

    rows = []
    for n_chains in (256, 1024):
        signal.alarm(900)
        log(f"n_chains={n_chains}")
        r = measure(n_chains)
        rows.append(r)
        log(json.dumps(r))
        with open(os.path.join(HERE, "fused_split.json"), "w") as f:
            json.dump(rows, f, indent=1)
    signal.alarm(0)
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
