"""Chunked fused-execution driver for steady-state DREAM-zs.

Drives ops/fused_chunk.py: a ``lax.scan`` over ``archive_thin``-generation
chunks where each chunk is (a) a handful of XLA ops that pregenerate the
chunk's randomness — the SAME threefry streams as the per-generation
engine (samplers/dream.py) — compute distinct archive row indices,
gather rows, and pack per-chain scalars, then (b) ONE Pallas kernel that
advances all G generations with x/logp in VMEM scratch, then (c) the
archive ring append. See ops/fused_chunk.py's module docstring for why
chunk = ``archive_thin`` gives exactly the per-generation semantics.

Scope (checked at build time): post-burn-in only (CR adaptation and
outlier resets are burn-in-gated in the per-generation engine, so the
frozen steady state is time-homogeneous) and replicated archive.
Populations may be chain-sharded over a 1-D mesh (``mesh=``): each
device runs the fused kernel on its shard and the only cross-device
traffic is one [n, d] all_gather per chunk for the ring append. The
API layer (samplers/api.py) routes burn-in and unaligned segments
through the per-generation engine and only the aligned steady-state
remainder through here.

Key discipline: ``step_key(base_key, t)`` + per-chain ``fold_in`` on the
global chain id, identical to ChainPool.run — for the same base key the
fused and per-generation engines consume identical random streams, and
their trajectories agree up to float re-association (exactly, when the
per-generation engine runs its Pallas proposal path —
tests/test_fused_chunk.py).
"""

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from bipymc_tpu.core.rng import bits_to_uniform, uniform_to_normal, step_key
from bipymc_tpu.ensemble.archive import archive_append
from bipymc_tpu.ensemble.indices import distinct_from_bits
from bipymc_tpu.ops.fused_chunk import (
    fused_chunk_pallas, lp_block_cache)
from bipymc_tpu.parallel.collectives import all_gather_chains, chain_offset
from bipymc_tpu.parallel.mesh import CHAIN_AXIS
from bipymc_tpu.samplers.dream import DreamConfig, DreamState
from bipymc_tpu.utils.streaming import rhat_init, rhat_update_block


def validate_fused_segment(cfg: DreamConfig, t0: int):
    """Check a concrete segment start is archive-aligned and post-burn-in."""
    G = cfg.archive_thin
    if t0 % G != 0:
        raise ValueError(f"t0={t0} not archive-aligned (thin={G})")
    if t0 < cfg.burnin_gens:
        raise ValueError(
            f"fused engine is post-burn-in only (t0={t0} < "
            f"burnin_gens={cfg.burnin_gens}); run the per-generation "
            "engine through burn-in first")


def _kernel_rng_seeds(keys, offset):
    """Per-generation in-kernel-PRNG seed words for the chain shard
    whose first global chain index is ``offset``.

    Folding ``offset`` decorrelates mesh shards (each device's kernel
    draws from a distinct stream); the in-kernel ``prng_seed`` then
    folds the local chain-block id. Deterministic given the base key
    and mesh layout, but — unlike rng="stream" — kernel-RNG
    trajectories are NOT bit-identical across different device counts
    (the (offset, block) decomposition of a chain differs).
    """
    return jax.vmap(lambda kk: jax.random.bits(
        jax.random.fold_in(
            jax.random.fold_in(kk, 0x6B524E47), offset), (),
        jnp.uint32))(keys)


# Archive row-gather strategy for the fused chunk
# ("block" | "pergen" | "kernel").
# "block" issues ONE [G, n, k]-index gather per chunk; "pergen" scans G
# per-generation [n, k] gathers (lax.map), matching the per-generation
# engine's op shape; "kernel" routes the block gather through the
# capacity-independent HBM-DMA kernel (ops/gather_rows.py) — the XLA
# gather lowerings can cost O(archive capacity), the kernel cannot.
# Values are identical for all three; only the lowering differs.
# Module-level so a hardware A/B can flip it in-process.
_GATHER_MODE = "block"
_GATHER_MODES = ("block", "pergen", "kernel")


def _gather_rows(buf, row_idx, mode=None, interpret=False):
    """buf[row_idx] with a switchable lowering (see _GATHER_MODE).

    mode=None reads the module global AT TRACE TIME — callers that want
    to A/B the lowering must build (and jit) a fresh runner per arm, or
    pass ``make_chunk_runner(gather_mode=...)`` so the choice is part of
    the runner's identity instead of hidden trace-time state.
    """
    mode = mode or _GATHER_MODE
    if mode == "pergen":
        return jax.lax.map(lambda ri: buf[ri], row_idx)
    if mode == "kernel":
        from bipymc_tpu.ops.gather_rows import gather_rows_pallas
        return gather_rows_pallas(buf, row_idx, interpret=interpret)
    return buf[row_idx]


def check_fusable(cfg: DreamConfig, mesh=None):
    """Raise if the fused engine cannot reproduce this configuration."""
    if not cfg.use_archive:
        raise ValueError("fused engine requires use_archive=True "
                         "(population-DREAM gathers the live population)")
    if cfg.shard_archive:
        raise ValueError("fused engine requires a replicated archive "
                         "(shard_archive=True uses the per-generation "
                         "engine's ppermute ring path)")
    if mesh is not None:
        n_dev = int(mesh.devices.size)
        if cfg.n_chains % n_dev:
            raise ValueError(
                f"n_chains={cfg.n_chains} must be divisible by the "
                f"mesh's {n_dev} devices")


def make_chunk_runner(log_prob: Callable, cfg: DreamConfig,
                      log_prob_block: Callable | None = None,
                      interpret: bool | None = None,
                      collect: str = "all",
                      prep_chunks: int = 8,
                      mesh=None,
                      rng: str = "stream",
                      wrap: bool = True,
                      gather_mode: str | None = None,
                      z_update_every: int = 1,
                      _test_stream_bits: bool = False) -> Callable:
    """Build ``run(state, base_key, n_gens, t0) -> (state, history)``.

    n_gens must be a multiple of ``cfg.archive_thin``; ``t0`` (a Python
    int == the state's generation counter) must be archive-aligned
    (``t0 % archive_thin == 0``) and ``>= cfg.burnin_gens``. history is
    ``{"x": [n_gens, n, d], "logp": [n_gens, n], "accepted": ...}`` —
    the same leaves as the default ChainPool collection.

    log_prob_block: optional ``[BC, Dp]-padded -> [BC, 1]`` kernel-side
    target (see ops/fused_chunk.block_logp_from_scalar); default wraps
    ``log_prob``. collect: ``"all"`` keeps per-generation positions in
    history; ``"stats"`` keeps only logp/accepted (positions cost
    n_gens·n·d floats — at 4096 chains × d=100 that is 1.6 GB per 1000
    generations, the difference between fitting in HBM or not);
    ``"rhat"`` folds per-chain Welford moments inside the runner's own
    scan and returns them as ``hist["rhat"]`` (an RhatCarry) next to the
    stats leaves — what ``ChainPool.run_until`` merges, so an R̂-stop
    loop never materializes positions at all.

    prep_chunks: batch the randomness/scalar pregeneration over this
    many chunks per outer scan step (docs/design.md §10e's "batch the
    prep" lever). Legal because everything pregenerated is independent
    of the archive *content*: threefry streams key on the absolute
    generation index, and the CR table is frozen post-burn-in. Only the
    fill-dependent distinct-row draw, the Z gather, the kernel, and the
    append remain per-chunk. Trajectories are bit-identical for every
    value; the knob only moves launch overhead.

    mesh: optional 1-D chain mesh. The runner then executes as ONE SPMD
    program under ``jax.shard_map`` — each device runs the fused kernel
    on its chain shard against the replicated archive, and the only
    cross-device traffic is ONE [n, d] ``all_gather`` per chunk for the
    ring append (the identical collective placement as the
    per-generation engine's sharded path, samplers/dream.py). With
    rng="stream", streams fold on GLOBAL chain ids, so trajectories are
    bit-identical to the single-device runner for the same base key
    (tests/test_fused_chunk.py::test_fused_mesh_matches_single_device);
    with rng="kernel" each shard seeds a distinct PRNG stream (global
    offset folded — :func:`_kernel_rng_seeds`), so mesh runs are
    deterministic and shard-decorrelated but not bit-identical across
    device counts.

    rng: ``"stream"`` (default) pregenerates u_mask/u_e/eps XLA-side —
    the bit-identical-to-the-per-generation-engine contract. ``
    "kernel"`` draws them from the TPU hardware PRNG *inside* the fused
    kernel (seeded per generation from the same threefry hierarchy, so
    runs are reproducible given the base key): the per-chain word block
    shrinks 5+k+3d → 5+k and three of six streamed kernel operands
    disappear — measured the dominant cost at ≥1024 chains. Same
    proposal/accept math and same conversion maps, different bit
    source: NOT bit-identical to ``"stream"``, distributionally
    equivalent. TPU-only (the interpret PRNG is a zero stub).
    wrap: with a mesh, ``wrap=False`` returns the per-shard body
    (collectives on the chain axis) instead of the shard_map-wrapped
    program — for embedding inside a caller's own shard_map, e.g.
    ``ChainPool.run_until``'s fused chunks.
    z_update_every: publish archive appends every K = z_update_every
    thin-blocks instead of every block — K·archive_thin generations run
    as ONE kernel, with ONE distinct-row draw / Z gather / batched ring
    append (K thinned population snapshots, time-ordered) per super-
    block. This is ter Braak & Vrugt (2008)'s own structure — the paper
    updates Z "every K-th generation"; K·archive_thin is simply a larger
    update interval, with every intermediate thinned snapshot still
    appended at update time — so the stationary distribution is
    unchanged. Proposals inside a super-block sample a Z that is stale
    by up to K·archive_thin generations, so K > 1 trajectories are NOT
    bit-identical to the per-generation engine (K = 1 is, with
    rng="stream"); the random streams themselves still key on absolute
    generation indices and are identical for every K. Requires
    ``K · n_chains ≤ archive capacity`` (a batched append may not wrap
    onto itself). The payoff is per-generation XLA glue (distinct-idx
    draw, gather, append, kernel launch) amortized K×: the dominant
    non-kernel cost at the 256-chain headline (docs/design.md §10g).
    _test_stream_bits: testing hook — stream the exact bits the
    "stream" path would consume through the in-kernel conversion code
    instead of the PRNG, making rng="kernel" reproduce rng="stream"
    bitwise on CPU (tests/test_fused_chunk.py).
    """
    if rng not in ("stream", "kernel"):
        raise ValueError(f"rng={rng!r}: expected 'stream' or 'kernel'")
    if collect not in ("all", "stats", "rhat"):
        raise ValueError(
            f"collect={collect!r}: expected 'all', 'stats' or 'rhat'")
    if gather_mode is not None and gather_mode not in _GATHER_MODES:
        raise ValueError(
            f"gather_mode={gather_mode!r}: expected one of {_GATHER_MODES}")
    check_fusable(cfg, mesh)
    K = int(z_update_every)
    if K < 1:
        raise ValueError(f"z_update_every={z_update_every}: must be >= 1")
    _interp = (jax.default_backend() != "tpu" if interpret is None
               else interpret)
    # On the mesh path the Pallas kernel runs PER SHARD, so the shape
    # that reaches Mosaic is the local chain count (round-4 ADVICE: the
    # first cut gated on the global count, wrongly rejecting 8 global
    # chains on 2 devices and missing 16 global chains on 2 devices).
    n_shard = (cfg.n_chains // mesh.devices.size if mesh is not None
               else cfg.n_chains)
    if K > 1 and n_shard == 8 and not _interp:
        # Measured Mosaic compiler crash (round 4): the K>1 super-block
        # kernel SIGABRTs tpu_compile_helper at EXACTLY n_chains=8 (one
        # f32 sublane tile), any d, any K>1 — n=4/6/10/12/16/32 all
        # compile and run. Guard with a clear error rather than let the
        # backend abort. Interpret mode (CPU) never invokes Mosaic and
        # stays valid (round-4 code review: the first cut raised
        # unconditionally and broke previously-green CPU configs); the
        # per-block engine (z_update_every=1) is unaffected at n=8.
        raise ValueError(
            "fused_z_update > 1 with 8 chains per device hits a Mosaic "
            "compiler crash on TPU (see samplers/dream_fused.py) — use "
            "z_update_every=1 or a different per-device chain count")
    axis = CHAIN_AXIS if mesh is not None else None
    G = cfg.archive_thin
    CG = K * G                     # generations per kernel / super-block
    n_pairs = cfg.delta_max
    n_rows = max(2 * n_pairs, 3)
    _lp_block_for = lp_block_cache(log_prob, log_prob_block)

    def runner_local(state: DreamState, base_key, n_gens: int, t0):
        """n_gens: static; t0: Python int or traced int32 scalar (traced
        skips the alignment validation — do it at the call site via
        :func:`validate_fused_segment`). On the mesh path this body runs
        per shard (n = local chains) with collectives on ``axis``."""
        if n_gens % CG != 0:
            raise ValueError(
                f"n_gens={n_gens} not a multiple of the super-block "
                f"length {CG} (archive_thin={G} x z_update_every={K})")
        if isinstance(t0, int):
            validate_fused_segment(cfg, t0)
        # archive is replicated in fused scope (check_fusable), so
        # buf.shape[0] is the global capacity on the mesh path too
        if K * cfg.n_chains > state.archive.buf.shape[0]:
            raise ValueError(
                f"z_update_every={K}: a batched append publishes "
                f"{K * cfg.n_chains} rows at once, exceeding the "
                f"archive capacity {state.archive.buf.shape[0]} — "
                "raise archive_capacity or lower z_update_every")
        n, dim = state.x.shape
        dtype = state.x.dtype
        lp_block = _lp_block_for(dim)
        kernel_rng = rng == "kernel"
        # kernel-RNG shrinks the per-chain threefry block to the scalar
        # + row words (the 3d mask/e/eps words move into the kernel)
        nw = 5 + n_rows + (0 if kernel_rng and not _test_stream_bits
                           else 3 * dim)
        interp = (jax.default_backend() != "tpu" if interpret is None
                  else interpret)
        if kernel_rng and interp and not _test_stream_bits:
            raise ValueError(
                "rng='kernel' needs the TPU hardware PRNG (the interpret "
                "stub returns zeros); use rng='stream' off-TPU")
        gid = chain_offset(n, axis) + jnp.arange(n, dtype=jnp.int32)
        cr_cum = state.cr_cum  # frozen post-burn-in (check_fusable scope)

        def prep(ts):
            """Pregenerate everything archive-independent for the B
            generations with absolute indices ``ts`` ([B] int32).
            Identical stream construction to samplers/dream.py step:
            per-gen step key, per-chain fold on the global chain id, ONE
            bits block per (gen, chain) — keyed on the ABSOLUTE index,
            so values do not depend on how gens are grouped into
            superchunks."""
            B = ts.shape[0]
            keys = jax.vmap(lambda t: step_key(base_key, t))(ts)
            ckeys = jax.vmap(
                lambda kk: jax.vmap(
                    lambda i: jax.random.fold_in(kk, i))(gid))(keys)
            blk = jax.vmap(jax.vmap(
                lambda kk: jax.random.bits(kk, (nw,), jnp.uint32)))(ckeys)
            u_all = bits_to_uniform(blk, dtype)            # [B, n, nw]
            u_scal = u_all[..., 0:3]
            u_cr = u_all[..., 3]
            u_acc = u_all[..., 4]
            row_bits = blk[..., 5:5 + n_rows]
            off = 5 + n_rows
            if not kernel_rng:
                u_mask = u_all[..., off:off + dim]
                u_e = u_all[..., off + dim:off + 2 * dim]
                eps_n = uniform_to_normal(u_all[..., off + 2 * dim:])
            else:
                # one PRNG seed word per generation, drawn from a folded
                # branch of the same threefry hierarchy (reproducible
                # given base_key; disjoint from the main stream). The
                # GLOBAL chain offset folds in too: without it every
                # mesh shard would seed the in-kernel PRNG identically
                # and chains would draw the same randomness on every
                # device (cross-shard correlation, review finding). On
                # the vmap path the offset is 0 — a plain fold.
                seeds = _kernel_rng_seeds(
                    keys, chain_offset(n, axis))

            # per-chain scalars, mirroring the pallas branch of
            # samplers/dream.py propose_all; cr_cum is the frozen
            # steady-state table so this too is chunk-independent
            cr_idx = jnp.minimum(
                jnp.sum(u_cr[..., None] >= cr_cum[None, None, :],
                        axis=-1),
                cfg.n_cr - 1).astype(jnp.int32)
            delta = 1 + jnp.floor(u_scal[..., 1] * n_pairs)
            delta = jnp.minimum(delta, float(n_pairs)).astype(dtype)
            cr = (cr_idx + 1).astype(dtype) / cfg.n_cr
            gamma_s = cfg.snooker_lo + \
                (cfg.snooker_hi - cfg.snooker_lo) * u_scal[..., 2]
            is_snk = ((cfg.p_snooker > 0.0)
                      & (u_scal[..., 0] < cfg.p_snooker)).astype(dtype)
            gj = ((ts % cfg.jump_interval) == (cfg.jump_interval - 1))
            gj = jnp.broadcast_to(
                gj[:, None], (B, n)).astype(dtype)
            if cfg.jump_full_cr:
                cr = jnp.where(gj > 0, jnp.asarray(1.0, dtype), cr)
            scal = jnp.stack(
                [delta, cr, gamma_s, is_snk, gj, jnp.log(u_acc)], axis=-1)
            if not kernel_rng:
                return row_bits, scal, (u_mask, u_e, eps_n)
            if _test_stream_bits:
                tb = tuple(blk[..., off + j * dim:off + (j + 1) * dim]
                           for j in range(3))
                return row_bits, scal, (seeds, tb)
            return row_bits, scal, (seeds,)

        def chunk_core(carry, xs):
            """One CG-generation super-block from pregenerated inputs:
            the fill-dependent distinct-row draw, the Z gather, the
            fused kernel, and the batched ring append (K thinned
            snapshots published together — exactly the per-generation
            schedule when K == 1). collect="rhat" threads a Welford
            carry alongside the state."""
            st = carry[0] if collect == "rhat" else carry
            row_bits, scal, rng_in = xs                  # [CG, n, ...]
            # distinct archive rows — same construction as the
            # per-generation engine (identical bits → identical rows);
            # with K > 1 every generation in the super-block samples
            # the super-block-start archive (fill and contents)
            if interp:
                row_idx = jax.vmap(jax.vmap(
                    lambda bb: distinct_from_bits(
                        bb, n_rows, st.archive.fill)))(row_bits)
            else:
                from bipymc_tpu.ops.distinct_idx import distinct_idx_pallas
                row_idx = distinct_idx_pallas(
                    row_bits.reshape(CG * n, n_rows), n_rows,
                    st.archive.fill).reshape(CG, n, n_rows)
            rows = _gather_rows(st.archive.buf, row_idx, gather_mode,
                                interpret=interp)    # [CG, n, k, d]

            if not kernel_rng:
                u_mask, u_e, eps_n = rng_in
                xh, lph, acc = fused_chunk_pallas(
                    st.x, st.logp, rows, u_mask, u_e, eps_n, scal,
                    lp_block, n_pairs=n_pairs, d_true=dim,
                    b=cfg.b, b_star=cfg.b_star, interpret=interp)
            else:
                seeds = rng_in[0]
                tb = rng_in[1] if _test_stream_bits else None
                xh, lph, acc = fused_chunk_pallas(
                    st.x, st.logp, rows, None, None, None, scal,
                    lp_block, n_pairs=n_pairs, d_true=dim,
                    b=cfg.b, b_star=cfg.b_star, interpret=interp,
                    rng="kernel", seeds=seeds, test_bits=tb)

            x_new = xh[-1]
            logp_new = lph[-1]
            # archive append: the thinned snapshots (gen % thin ==
            # thin-1, the per-generation engine's schedule) publish as
            # ONE time-ordered batched append — identical rows and ring
            # positions to K sequential appends, and bit-identical to
            # the per-generation engine when K == 1
            snaps = xh[G - 1::G]                         # [K, n, d]
            pub = (snaps if axis is None
                   else lax.all_gather(snaps, axis, axis=1, tiled=True))
            new_st = DreamState(
                x=x_new, logp=logp_new,
                archive=archive_append(
                    st.archive, pub.reshape(-1, pub.shape[-1])),
                cr_p=st.cr_p, cr_cum=st.cr_cum,
                cr_jump=st.cr_jump, cr_count=st.cr_count,
                logp_sum=st.logp_sum + jnp.sum(lph, axis=0),
                gen=st.gen + CG)
            snk = scal[..., 3] > 0.5
            if collect == "rhat":
                # fold this G-block's positions into the carried moments
                # instead of materializing them: run_until only needs the
                # Welford carry, and the [n_gens, n, d] history is the
                # difference between O(G·n·d) and O(chunk·n·d) live bytes
                # inside the caller's while_loop
                rc = rhat_update_block(carry[1], xh)
                return (new_st, rc), (lph, acc, snk)
            ys = ((xh, lph, acc, snk) if collect == "all"
                  else (lph, acc, snk))
            return new_st, ys

        n_chunks = n_gens // CG
        # prep batching amortizes per-chunk launch overhead; a K-super-
        # block already prepares K blocks at once, so scale M down to
        # keep the live prep bytes (M*CG gens x n x nw words) flat —
        # at rng="stream" nw is 5+k+3d and M=prep_chunks with K=8 would
        # spike the prep block into hundreds of MB
        M = max(1, min(int(prep_chunks) // K, n_chunks))
        q, r = divmod(n_chunks, M)

        if collect == "rhat":
            nl, dl = state.x.shape
            carry0 = (state, rhat_init(nl, dl, state.x.dtype))
        else:
            carry0 = state

        def superchunk(carry, s):
            ts = t0 + s * (M * CG) + jnp.arange(M * CG, dtype=jnp.int32)
            pre = prep(ts)                                # [M*CG, n, ...]
            pre = jax.tree_util.tree_map(
                lambda a: a.reshape(M, CG, *a.shape[1:]), pre)
            return lax.scan(chunk_core, carry, pre)

        parts = []
        carry, ys = lax.scan(
            superchunk, carry0, jnp.arange(q, dtype=jnp.int32))
        # ys leaves are [q, M, CG, ...] → flatten the chunk axes
        parts.append(jax.tree_util.tree_map(
            lambda a: a.reshape(q * M * CG, *a.shape[3:]), ys))
        if r:
            def rem(c, k):
                ts = (t0 + (q * M + k) * CG
                      + jnp.arange(CG, dtype=jnp.int32))
                return chunk_core(c, prep(ts))
            carry, ys_r = lax.scan(
                rem, carry, jnp.arange(r, dtype=jnp.int32))
            parts.append(jax.tree_util.tree_map(
                lambda a: a.reshape(r * CG, *a.shape[2:]), ys_r))
        ys = (parts[0] if len(parts) == 1 else
              jax.tree_util.tree_map(
                  lambda a, b: jnp.concatenate([a, b], axis=0), *parts))
        if collect == "all":
            state = carry
            xh, lph, acc, snk = ys
            hist = {"x": xh, "logp": lph, "accepted": acc,
                    "snooker": snk}
        elif collect == "rhat":
            state, rc = carry
            lph, acc, snk = ys
            hist = {"rhat": rc, "logp": lph, "accepted": acc,
                    "snooker": snk}
        else:
            state = carry
            lph, acc, snk = ys
            hist = {"logp": lph, "accepted": acc, "snooker": snk}
        return state, hist

    # contract attributes ChainPool.run_until validates at its entry
    # (its t0 is traced by the time the runner's own check could fire):
    # chunk lengths must cover whole super-blocks, t0 must be
    # archive-aligned, and the history this runner records is the
    # population x
    runner_local.align = int(G)
    runner_local.chunk_multiple = int(CG)
    runner_local.position_field = "x"

    if mesh is None or not wrap:
        # wrap=False with a mesh: the LOCAL per-shard body (collectives
        # on the chain axis, no shard_map of its own) for embedding in a
        # caller's shard_map program — ChainPool.run_until's fused path.
        return runner_local

    from jax.sharding import PartitionSpec as P
    from bipymc_tpu.parallel.pool import _history_spec, _state_specs

    def runner(state: DreamState, base_key, n_gens: int, t0):
        if isinstance(t0, int):
            validate_fused_segment(cfg, t0)
        state_specs = _state_specs(
            state, ("x", "logp", "logp_sum"), axis)
        hist_ndim = {"logp": 2, "accepted": 2, "snooker": 2}
        if collect == "all":
            hist_ndim["x"] = 3
        hist_specs = {k: _history_spec(nd, axis)
                      for k, nd in hist_ndim.items()}
        if collect == "rhat":
            from bipymc_tpu.utils.streaming import RhatCarry
            hist_specs["rhat"] = RhatCarry(
                n=P(), mean=P(axis, None), m2=P(axis, None))
        fn = jax.shard_map(
            lambda s, k, t: runner_local(s, k, n_gens, t),
            mesh=mesh, in_specs=(state_specs, P(), P()),
            out_specs=(state_specs, hist_specs), check_vma=False)
        return fn(state, base_key, jnp.asarray(t0, jnp.int32))

    runner.align = int(G)
    runner.chunk_multiple = int(CG)
    runner.position_field = "x"
    return runner
