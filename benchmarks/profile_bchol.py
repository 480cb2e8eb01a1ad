#!/usr/bin/env python
"""A/B: Pallas batched Cholesky (ops/pallas_bchol) vs XLA's batched
cholesky, plus the end-to-end config-4 effect.

XLA's batched cholesky is critical-path-bound: ~112µs/matrix at n=512
for every batch ≥ 16 (measured; benchmarks/config4_scaling.json). The
Pallas kernel factors 8 matrices per grid cell with the serial
elimination chain shared across the cell. Same-session interleaved
best-of-3, 200-iteration dependent scans per timing (amortises the
~30ms tunnel call floor). Writes benchmarks/bchol_ab.json.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bipymc_tpu.ops.pallas_bchol import cholesky_batched_pallas

HERE = os.path.dirname(os.path.abspath(__file__))


def make_runner(fn, b, n, iters):
    key = jax.random.key(0)
    x = jax.random.normal(key, (b, n, 24), jnp.float32)
    k = x @ jnp.swapaxes(x, -1, -2) / 24 + 3 * jnp.eye(n)

    def body(c, _):
        l = fn(c)
        # dependent feedback (exact zero net change) so the scan can't
        # elide or overlap factorisations
        c2 = c + (l[..., 0, 0] * 0.0)[..., None, None]
        return c2, jnp.sum(jnp.log(jnp.abs(jnp.diagonal(
            l, axis1=-2, axis2=-1)) + 1e-30))

    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=iters))
    jax.block_until_ready(f(k))           # compile + warm

    def timed():
        t0 = time.time()
        jax.block_until_ready(f(k))
        return (time.time() - t0) / iters / b * 1e6   # µs per matrix
    return timed


def main():
    print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr)
    np.asarray(jnp.ones(()))

    rows = []
    for b, n, iters in [(8, 256, 400), (64, 256, 200),
                        (8, 512, 200), (16, 512, 200), (64, 512, 100),
                        (256, 512, 30), (8, 1024, 50), (32, 1024, 20)]:
        xla = make_runner(jnp.linalg.cholesky, b, n, iters)
        pall = make_runner(lambda c: cholesky_batched_pallas(c), b, n,
                           iters)
        tx, tp = [], []
        for _ in range(3):
            tx.append(xla())
            tp.append(pall())
        row = {"b": b, "n": n,
               "xla_us_per_matrix": round(min(tx), 2),
               "pallas_us_per_matrix": round(min(tp), 2),
               "speedup": round(min(tx) / min(tp), 2)}
        rows.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)

    with open(os.path.join(HERE, "bchol_ab.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print("| B | n | XLA µs/mat | Pallas µs/mat | speedup |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['b']} | {r['n']} | {r['xla_us_per_matrix']} | "
              f"{r['pallas_us_per_matrix']} | {r['speedup']}x |")


if __name__ == "__main__":
    main()
