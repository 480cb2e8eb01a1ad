#!/usr/bin/env python
"""Measured shard_map overhead on the REAL chip (round-4 verdict #7).

docs/design.md §5c argues the multi-chip claim structurally: the mesh
path runs the same per-shard program plus one archive all_gather per
fused chunk, whose bytes are three orders of magnitude under the ICI
link budget. This harness replaces "structurally" with a measurement of
the one term we CAN measure without more chips: the shard_map
program-structure overhead itself — the fused DREAM-zs engine compiled
under a 1-device `Mesh(("chains",))` versus plain vmap, identical
shapes/streams/config (headline: d=100, 256 chains, kernel RNG).

What a 1-device mesh does and doesn't capture: it pays shard_map's
partitioning/program-structure cost and the degenerate (self-copy)
collective, but NOT real ICI hops (~1µs/hop) or cross-device skew. The
projection paragraph in design.md §5c combines this measured delta with
the link-budget arithmetic for the v5e-8 extrapolation.

Protocol (per arm): compile + one warm chunk, then TIMED_CHUNKS fused
chunks of CHUNK generations dispatched back-to-back (one block at the
end — §18 barrier discipline), repeated REPS times, best-rep rate kept
(the tunnel's ~30ms call floor amortises over the chunk run either way).
Writes benchmarks/mesh_overhead_ab.json.
"""

import json
import os
import sys
import time

import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    import jax
    _plats = os.environ["JAX_PLATFORMS"]
    if "cpu" not in _plats.split(","):
        _plats += ",cpu"
    jax.config.update("jax_platforms", _plats)

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bipymc_tpu.models.targets import (baseline_config3_means,
                                       gaussian_mixture,
                                       stratified_mode_init)
from bipymc_tpu.parallel.mesh import chain_mesh
from bipymc_tpu.samplers import dream
from bipymc_tpu.samplers.dream_fused import make_chunk_runner

HERE = os.path.dirname(os.path.abspath(__file__))
D, N_CHAINS, CHUNK, TIMED_CHUNKS, REPS = 100, 256, 2500, 2, 3
SEED = 0
SMOKE = os.environ.get("BENCH_SMOKE") == "1"
if SMOKE:
    D, N_CHAINS, CHUNK, TIMED_CHUNKS, REPS = 8, 32, 50, 2, 2


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(arm, mesh):
    means = baseline_config3_means(D)
    log_prob = gaussian_mixture(means, sigma=1.0)
    cfg = dream.DreamConfig(n_chains=N_CHAINS, burnin_gens=0)
    key = jax.random.key(SEED)
    k_x, k_z, k_run = jax.random.split(key, 3)
    means_j = jnp.asarray(means)
    x0 = stratified_mode_init(k_x, means_j, N_CHAINS, var=4.0)
    z0 = stratified_mode_init(k_z, means_j, N_CHAINS, var=4.0)
    state = dream.init(x0, log_prob, cfg, archive_capacity=8192, z0=z0)

    rng_mode = "kernel" if jax.default_backend() == "tpu" else "stream"
    # mesh=None → plain vmapped runner; mesh → the runner wraps itself
    # in shard_map over the chain axis (the DreamZs(mesh=..., fused=True)
    # program structure)
    fused = make_chunk_runner(log_prob, cfg, rng=rng_mode, mesh=mesh)
    run = jax.jit(lambda s, k, t: fused(s, k, CHUNK, t))

    t0 = time.time()
    state, _ = jax.block_until_ready(run(state, jax.random.fold_in(k_run, 0),
                                         jnp.int32(0)))
    t_compile = time.time() - t0
    best = np.inf
    for r in range(REPS):
        hists = []
        t0 = time.time()
        for c in range(TIMED_CHUNKS):
            t = jnp.int32((1 + r * TIMED_CHUNKS + c) * CHUNK)
            state, h = run(state, jax.random.fold_in(k_run, 1 + c), t)
            hists.append(h["x"])
        jax.block_until_ready(hists)
        best = min(best, time.time() - t0)
    gens = TIMED_CHUNKS * CHUNK
    log(f"{arm}: compile+warm {t_compile:.1f}s, best {gens / best:,.0f} "
        f"gens/s ({gens * N_CHAINS / best:,.0f} chain-steps/s)")
    return {"compile_plus_warm_s": round(t_compile, 2),
            "gens_per_s": round(gens / best, 1),
            "chain_steps_per_s": round(gens * N_CHAINS / best, 0)}


def main():
    log("devices:", jax.devices())
    np.asarray(jnp.ones(()))
    out = {"config": {"d": D, "n_chains": N_CHAINS, "chunk": CHUNK,
                      "timed_chunks": TIMED_CHUNKS, "reps": REPS,
                      "backend": jax.default_backend()}}
    out["vmap"] = measure("vmap", None)
    mesh = chain_mesh(jax.devices()[:1])
    out["mesh_1dev"] = measure("mesh_1dev", mesh)
    out["mesh_over_vmap"] = round(
        out["vmap"]["gens_per_s"] / out["mesh_1dev"]["gens_per_s"], 4)
    if SMOKE:
        out["smoke"] = True
    path = os.path.join(HERE, "mesh_overhead_ab.json")
    if SMOKE:
        path = path.replace(".json", "_smoke.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"mesh_over_vmap_slowdown": out["mesh_over_vmap"],
                      "vmap_gens_per_s": out["vmap"]["gens_per_s"],
                      "mesh_gens_per_s": out["mesh_1dev"]["gens_per_s"]}))


if __name__ == "__main__":
    main()
