"""Chunked fused-execution driver for the stretch ensemble sampler.

Drives ops/fused_stretch.py: a ``lax.scan`` over ``kernel_gens``-
generation chunks where each chunk is (a) a handful of XLA ops
pregenerating the chunk's randomness — the SAME threefry streams as the
per-generation engine (samplers/stretch.py: step_key on the absolute t,
split, per-walker fold by global index) converted with the identical
expressions (partner ``j = bits0 % half`` into the other half,
``z = ((a−1)u+1)²/a``, ``log u``) — then (b) ONE Pallas kernel advancing
all generations with the walker population in VMEM scratch.

Unlike DREAM-zs there is no archive and no burn-in adaptation, so the
whole run is time-homogeneous: every segment fuses (no alignment or
post-burn-in constraints), and the only knob is ``kernel_gens`` (scalar
operand staging per kernel call — launch overhead already amortizes
~64× at the default).

Scope: single-device (the population must fit one kernel cell for the
one-hot partner gather — ``ops/fused_stretch.MAX_WALKERS``); the mesh
path stays on the per-generation engine. Trajectories consume identical
random streams to the per-generation engine, agreeing exactly on accept
decisions and to float re-association on positions
(tests/test_stretch.py pins both).
"""

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from bipymc_tpu.core.rng import bits_to_uniform, step_key
from bipymc_tpu.ops.fused_chunk import lp_block_cache
from bipymc_tpu.utils.streaming import rhat_init, rhat_update_block
from bipymc_tpu.ops.fused_stretch import fused_stretch_pallas, MAX_WALKERS
from bipymc_tpu.samplers.stretch import StretchConfig, StretchState


def make_chunk_runner(log_prob: Callable, cfg: StretchConfig,
                      log_prob_block: Callable | None = None,
                      interpret: bool | None = None,
                      kernel_gens: int = 64,
                      collect: str = "all") -> Callable:
    """Build ``run(state, base_key, n_gens, t0) -> (state, history)``.

    With the default ``collect="all"``, history is ``{"x": [n_gens, n,
    d], "logp": [n_gens, n], "accepted": [n_gens, n]}`` — the same
    leaves as the per-generation ChainPool collection.
    ``collect="rhat"`` folds per-walker Welford moments across chunks
    inside the runner's own scan and returns them as ``hist["rhat"]``
    (an RhatCarry) instead of ``"x"`` — what ``ChainPool.run_until``
    merges, so an R̂-stop loop holds O(kernel_gens·n·d) live position
    bytes instead of O(chunk·n·d). ``t0`` may be a Python int or a
    traced int32 scalar (continuation runs); any n_gens ≥ 1 is legal.
    """
    n = cfg.n_chains
    if n % 2:
        raise ValueError("stretch move needs an even number of walkers")
    if n > MAX_WALKERS:
        raise ValueError(
            f"fused stretch engine supports <= {MAX_WALKERS} walkers; "
            f"got {n} — use the per-generation engine")
    if collect not in ("all", "rhat"):
        raise ValueError(f"collect={collect!r}: expected 'all' or 'rhat'")
    half = n // 2
    _lp_block_for = lp_block_cache(log_prob, log_prob_block)

    def runner_local(state: StretchState, base_key, n_gens: int, t0):
        dim = state.x.shape[1]
        dtype = state.x.dtype
        lp_block = _lp_block_for(dim)
        interp = (jax.default_backend() != "tpu" if interpret is None
                  else interpret)
        rows_lo = jnp.arange(half, dtype=jnp.int32)   # phase-1 active rows
        rows_hi = half + rows_lo                      # phase-2 active rows

        # packed-scalar dtype: indices must survive the packing exactly,
        # and bf16/f16 walker dtypes cannot represent every row < n
        # (bf16 integers are exact only to 256 < MAX_WALKERS). Pack in
        # promote(dtype, f32): z/log-u are computed in the walker dtype
        # first (the per-generation engine's exact values), so the
        # upcast-pack / downcast-read round trip is exact for every
        # supported dtype and f32/f64 trajectories are untouched.
        scal_dtype = jnp.promote_types(dtype, jnp.float32)

        def prep(ts):
            """scal [B, n, 6] for absolute generation indices ts [B] —
            the per-generation engine's exact stream construction.

            Only the ACTIVE half consumes each phase's lanes (phase 1:
            rows < half read J1/Z1/LU1; phase 2: rows ≥ half read
            J2/Z2/LU2 — the kernel masks the rest), and the per-
            generation engine folds k1 only over rows_lo and k2 only
            over rows_hi — so draw exactly those n blocks per
            generation (not 2n) and zero-fill the dead lanes. With
            z = 0 the masked phase computes x* = x[0] (finite), so the
            zero fill is inert.
            """
            def one(t):
                k1, k2 = jax.random.split(step_key(base_key, t))
                blk1 = jax.vmap(lambda i: jax.random.bits(
                    jax.random.fold_in(k1, i), (3,), jnp.uint32))(rows_lo)
                blk2 = jax.vmap(lambda i: jax.random.bits(
                    jax.random.fold_in(k2, i), (3,), jnp.uint32))(rows_hi)

                def conv(blk, other_offset):
                    j = ((blk[:, 0] & jnp.uint32(0x7FFFFFFF))
                         .astype(jnp.int32) % half + other_offset)
                    u2 = bits_to_uniform(blk[:, 1:], dtype)
                    z = ((cfg.a - 1.0) * u2[:, 0] + 1.0) ** 2 / cfg.a
                    return (j.astype(scal_dtype), z.astype(scal_dtype),
                            jnp.log(u2[:, 1]).astype(scal_dtype))

                j1, z1, lu1 = conv(blk1, half)   # first half partners ≥ half
                j2, z2, lu2 = conv(blk2, 0)      # second half partners < half
                zero = jnp.zeros((half,), scal_dtype)
                top = jnp.stack([j1, z1, lu1, zero, zero, zero], axis=-1)
                bot = jnp.stack([zero, zero, zero, j2, z2, lu2], axis=-1)
                return jnp.concatenate([top, bot], axis=0)
            return jax.vmap(one)(ts)

        G = max(1, min(int(kernel_gens), n_gens))
        q, r = divmod(n_gens, G)

        def chunk(carry, ts):
            st = carry[0] if collect == "rhat" else carry
            xh, lph, acc = fused_stretch_pallas(
                st.x, st.logp, prep(ts), lp_block, n_true=n, half=half,
                d_true=dim, interpret=interp)
            new_st = StretchState(x=xh[-1], logp=lph[-1],
                                  gen=st.gen + ts.shape[0])
            if collect == "rhat":
                rc = rhat_update_block(carry[1], xh)
                return (new_st, rc), (lph, acc)
            return new_st, (xh, lph, acc)

        if collect == "rhat":
            carry0 = (state, rhat_init(n, dim, state.x.dtype))
        else:
            carry0 = state
        parts = []
        carry, ys = lax.scan(
            lambda c, s: chunk(c, t0 + s * G
                               + jnp.arange(G, dtype=jnp.int32)),
            carry0, jnp.arange(q, dtype=jnp.int32))
        parts.append(jax.tree_util.tree_map(
            lambda a: a.reshape(q * G, *a.shape[2:]), ys))
        if r:
            carry, ys_r = chunk(
                carry, t0 + q * G + jnp.arange(r, dtype=jnp.int32))
            parts.append(ys_r)
        ys = (parts[0] if len(parts) == 1 else
              jax.tree_util.tree_map(
                  lambda a, b: jnp.concatenate([a, b], axis=0), *parts))
        if collect == "rhat":
            state, rc = carry
            lph, acc = ys
            return state, {"rhat": rc, "logp": lph, "accepted": acc}
        state = carry
        xh, lph, acc = ys
        return state, {"x": xh, "logp": lph, "accepted": acc}

    # run_until contract attributes: no alignment constraints at all
    runner_local.align = 1
    runner_local.chunk_multiple = 1
    runner_local.position_field = "x"
    return runner_local
