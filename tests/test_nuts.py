"""NUTS (samplers/nuts.py) — gradient family, beyond-reference.

The load-bearing tests here are the two validations of the iterative
(checkpoint-stack) formulation against the textbook algorithm:

- ``test_checkpoint_index_math``: the store-slot / check-range index
  arithmetic covers EXACTLY the dyadic sub-subtree U-turn checks of the
  recursive algorithm, each once, with the correct partner state.
- ``test_matches_bruteforce_reference``: a NumPy float64 transcription
  of multinomial NUTS (explicit trajectory list, O(n²) dyadic-interval
  turn checks, per-leaf progressive sampling in generation order)
  driven by the SAME injected randomness reproduces the JAX sampler's
  trajectories, tree depths, leapfrog counts, and move decisions.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bipymc_tpu as bp
from bipymc_tpu.samplers import nuts
from bipymc_tpu.core.scan import run_scan
from bipymc_tpu.models.targets import correlated_gaussian, banana
from bipymc_tpu.parallel.mesh import chain_mesh

MEAN = np.array([1.0, -1.0])
COV = np.array([[2.0, 0.8], [0.8, 1.0]])


# ---------------------------------------------------------------------------
# the iterative-NUTS index arithmetic, validated exhaustively
# ---------------------------------------------------------------------------

def test_checkpoint_index_math():
    """For every subtree depth j ≤ 7, simulating the scheme (store even
    leaf m in slot popcount(m); at odd m check slots
    [popcount(m+1)−1 .. popcount(m−1)]) performs exactly the recursive
    algorithm's check set: one check per dyadic interval
    [m+1−2^s, m] (s ≥ 1) ending at each odd leaf, against the state of
    that interval's FIRST leaf."""
    for j in range(1, 8):
        slots = {}                     # slot -> leaf id currently stored
        checked = set()                # (first_leaf, last_leaf) pairs
        for m in range(2 ** j):
            if m % 2 == 0:
                slots[bin(m).count("1")] = m
            else:
                idx_min = bin(m + 1).count("1") - 1
                idx_max = bin(m - 1).count("1")
                for k in range(idx_min, idx_max + 1):
                    assert k in slots, (j, m, k)
                    checked.add((slots[k], m))
        expected = set()
        for m in range(1, 2 ** j, 2):
            s = 1
            while (m + 1) % (2 ** s) == 0 and 2 ** s <= m + 1:
                expected.add((m + 1 - 2 ** s, m))
                s += 1
        assert checked == expected, j


# ---------------------------------------------------------------------------
# brute-force NumPy reference (float64, explicit trajectory storage)
# ---------------------------------------------------------------------------

def _ref_nuts_gen(x, logp0, g0, lp_g, eps, inv_mass, z, u_dir, u_merge,
                  u_leaf, max_depth, max_delta=1000.0):
    """One multinomial-NUTS generation, textbook transcription: the
    subtree trajectory is stored whole and every dyadic interval ending
    at an odd leaf is checked directly."""
    p0 = z / np.sqrt(inv_mass)
    H0 = logp0 - 0.5 * np.sum(p0 * p0 * inv_mass)
    dirs = np.where(u_dir < 0.5, -1.0, 1.0)
    x_l = x_r = x
    p_l = p_r = p0
    g_l = g_r = g0
    prop = (x, logp0, g0)
    tree_lw = 0.0
    n = 0
    depth = 0
    moved = False
    diverged = False
    sum_alpha = 0.0
    for j in range(max_depth):
        v = dirs[j]
        xc, pc, gc = (x_r, p_r, g_r) if v > 0 else (x_l, p_l, g_l)
        sub_lw = -np.inf
        sprop = None
        traj = []
        bad = False
        for m in range(2 ** j):
            ph = pc + 0.5 * v * eps * gc
            xn = xc + v * eps * inv_mass * ph
            ln, gn = lp_g(xn)
            pn = ph + 0.5 * v * eps * gn
            Kn = 0.5 * np.sum(pn * pn * inv_mass)
            log_w = (ln - Kn) - H0
            finite = np.isfinite(log_w) and np.all(np.isfinite(xn))
            if not finite:
                log_w = -np.inf
            div_now = (not finite) or (log_w < -max_delta)
            sum_alpha += np.exp(min(log_w, 0.0))
            new_sub = np.logaddexp(sub_lw, log_w)
            if np.log(u_leaf[n]) < log_w - new_sub:
                sprop = (xn, ln, gn)
            sub_lw = new_sub
            traj.append((xn, pn))
            sub_turn = False
            if m % 2 == 1:
                s = 1
                while (m + 1) % (2 ** s) == 0 and 2 ** s <= m + 1:
                    xa, pa = traj[m + 1 - 2 ** s]
                    dx = (xn - xa) * v
                    if (np.sum(dx * inv_mass * pa) < 0
                            or np.sum(dx * inv_mass * pn) < 0):
                        sub_turn = True
                    s += 1
            n += 1
            xc, pc, gc = xn, pn, gn
            if div_now or sub_turn:
                diverged = diverged or div_now
                bad = True
                break
        if bad:
            break
        if v > 0:
            x_r, p_r, g_r = xn, pn, gn
        else:
            x_l, p_l, g_l = xn, pn, gn
        dxt = x_r - x_l
        turn_tree = (np.sum(dxt * inv_mass * p_l) < 0
                     or np.sum(dxt * inv_mass * p_r) < 0)
        if np.log(u_merge[j]) < sub_lw - tree_lw:
            prop = sprop
            moved = True
        tree_lw = np.logaddexp(tree_lw, sub_lw)
        depth = j + 1
        if turn_tree:
            break
    alpha = sum_alpha / max(n, 1)
    return prop, depth, n, diverged, moved, alpha


@pytest.mark.parametrize("max_depth,eps", [(6, 0.25), (3, 0.9)])
def test_matches_bruteforce_reference(max_depth, eps):
    """Injected-stream equivalence in float64: the iterative JAX engine
    reproduces the textbook transcription's trajectory and every
    integer decision (depth, leapfrog count, divergence, move). The
    (3, 0.9) config runs a coarse step so turning and divergence paths
    fire constantly."""
    with jax.enable_x64(True):
        T = 60
        d = 2
        n_leaf = 1 << max_depth
        rng = np.random.RandomState(42 + max_depth)
        Z = rng.standard_normal((T, d))
        U_dir = rng.uniform(size=(T, max_depth))
        U_merge = rng.uniform(size=(T, max_depth))
        U_leaf = rng.uniform(size=(T, n_leaf))
        inv_mass = np.array([1.0, 2.5])

        lp = banana()

        def draws_fn(key, t, dd, dtype):
            del key
            return (jnp.asarray(Z, dtype)[t], jnp.asarray(U_dir, dtype)[t],
                    jnp.asarray(U_merge, dtype)[t],
                    jnp.asarray(U_leaf, dtype)[t])

        cfg = nuts.nuts_config(max_depth=max_depth, step_size=eps,
                               adapt_gens=0)
        step = nuts.make_step(lp, cfg, draws_fn=draws_fn)
        x0 = jnp.asarray([[0.4, -0.3]], jnp.float64)
        state = nuts.init(x0, lp, cfg, inv_mass0=jnp.asarray(inv_mass))
        _, hist = jax.jit(lambda s: run_scan(
            step, s, jax.random.key(0), T,
            collect_fn=lambda st, i: (st.x, i.tree_depth, i.n_leapfrog,
                                      i.diverged, i.accepted)))(state)
        xs, depths, nlfs, divs, movs = [np.asarray(h) for h in hist]

        # NumPy reference, same draws
        def lp_g(xx):
            v, g = jax.value_and_grad(lp)(jnp.asarray(xx))
            return float(v), np.asarray(g)

        x = np.array([0.4, -0.3])
        logp, g = lp_g(x)
        for t in range(T):
            (x, logp, g), depth, n, div, mov, _ = _ref_nuts_gen(
                x, logp, g, lp_g, eps, inv_mass, Z[t], U_dir[t],
                U_merge[t], U_leaf[t], max_depth)
            assert depths[t, 0] == depth, t
            assert nlfs[t, 0] == n, t
            assert bool(divs[t, 0]) == div, t
            assert bool(movs[t, 0]) == mov, t
            np.testing.assert_allclose(xs[t, 0], x, rtol=1e-9, atol=1e-12,
                                       err_msg=f"gen {t}")

        # both control-flow paths actually fired across the run
        if max_depth == 3:
            assert divs.any() or (depths < max_depth).any()
        assert (depths > 0).any()


# ---------------------------------------------------------------------------
# statistical / API behavior
# ---------------------------------------------------------------------------

def test_moments_on_correlated_gaussian():
    s = bp.Nuts(correlated_gaussian(MEAN, COV), n_chains=16, seed=0,
                max_depth=6, adapt_gens=400)
    s.run_mcmc(1600, jnp.zeros(2), spread=1.5)
    flat = s.get_chain(discard=500, flat=True)
    assert np.abs(flat.mean(0) - MEAN).max() < 0.1
    assert np.abs(np.cov(flat.T) - COV).max() < 0.3


def test_tree_depth_adapts_not_saturated():
    """With dual-averaged ε on a well-conditioned Gaussian the no-U-turn
    criterion must terminate trajectories strictly inside the depth
    budget (saturation means the criterion never fires — a broken
    check), and depth must exceed 0 (trajectories actually grow)."""
    lp = correlated_gaussian(MEAN, COV)
    cfg = nuts.nuts_config(max_depth=8, adapt_gens=200)
    step = nuts.make_step(lp, cfg)
    state = nuts.init(jnp.zeros((8, 2)), lp, cfg)
    _, hist = jax.jit(lambda s: run_scan(
        step, s, jax.random.key(3), 400,
        collect_fn=lambda st, i: i.tree_depth))(state)
    depths = np.asarray(hist)[200:]          # post-warmup
    assert depths.mean() > 0.5
    assert (depths < 8).mean() > 0.9
    assert depths.max() < 8 or (depths == 8).mean() < 0.5


def test_dual_averaging_hits_target_accept():
    s = bp.Nuts(correlated_gaussian(MEAN, COV), n_chains=32, seed=1,
                max_depth=6, adapt_gens=400)
    s.run_mcmc(1200, jnp.zeros(2), spread=1.0)
    # HG statistic is carried per generation in accept_prob; the history
    # default collects `accepted` (moved) — recompute from a raw scan
    cfg = s.cfg
    step = nuts.make_step(s.log_like_fn, cfg)
    state = nuts.init(jnp.zeros((32, 2)), s.log_like_fn, cfg)
    _, hist = jax.jit(lambda st: run_scan(
        step, st, jax.random.key(1), 800,
        collect_fn=lambda st_, i: i.accept_prob))(state)
    a = np.asarray(hist)[400:]
    assert 0.65 < a.mean() < 0.95


def test_chain_count_invariance():
    lp = correlated_gaussian(MEAN, COV)
    x0 = jnp.tile(jnp.array([[0.5, -0.5], [1.5, 0.5]]), (4, 1))
    a = bp.Nuts(lp, n_chains=4, seed=7, max_depth=5)
    a.run_mcmc(80, x0[:4])
    b = bp.Nuts(lp, n_chains=8, seed=7, max_depth=5)
    b.run_mcmc(80, x0)
    np.testing.assert_array_equal(a.super_chain, b.super_chain[:4])


def test_mesh_equals_vmap():
    """Zero in-step collectives → identical streams/math on the mesh
    path; bit-identical at this batch shape (2 chains/device). The
    general cross-shape contract is HMC's (hmc.py module docstring /
    test_hmc.py::test_mesh_one_chain_per_device_ulp_contract): batch-1
    local programs can round ~1 ulp differently and the Hamiltonian
    trajectory amplifies that chaotically."""
    lp = correlated_gaussian(MEAN, COV)
    a = bp.Nuts(lp, n_chains=16, seed=4, max_depth=5)
    a.run_mcmc(100, jnp.zeros(2), spread=1.0)
    b = bp.Nuts(lp, n_chains=16, seed=4, max_depth=5, mesh=chain_mesh())
    b.run_mcmc(100, jnp.zeros(2), spread=1.0)
    np.testing.assert_array_equal(a.super_chain, b.super_chain)


def test_divergence_hard_rejects():
    lp = lambda th: jnp.where(jnp.all(jnp.abs(th) < 1.0),
                              -0.5 * jnp.sum(th * th), -jnp.inf)
    s = bp.Nuts(lp, n_chains=4, seed=6, max_depth=5, step_size=0.5,
                adapt_gens=0)
    s.run_mcmc(200, jnp.zeros(2), spread=0.1)
    assert np.all(np.isfinite(s.flat_chain))
    assert np.all(np.abs(s.flat_chain) < 1.0)


def test_run_until_rhat_stop():
    s = bp.Nuts(correlated_gaussian(MEAN, COV), n_chains=16, seed=5,
                max_depth=6, adapt_gens=200)
    info = s.run_mcmc_until(jnp.zeros(2), rhat_tol=1.05, chunk=100,
                            max_chunks=50, warmup_chunks=3, spread=2.0)
    assert info["rhat"].max() < 1.05
    assert info["steps"] >= 300


def test_continuation_matches_single_run():
    lp = correlated_gaussian(MEAN, COV)
    a = bp.Nuts(lp, n_chains=4, seed=9, max_depth=4)
    a.run_mcmc(60, jnp.zeros(2))
    a.run_mcmc(40)
    b = bp.Nuts(lp, n_chains=4, seed=9, max_depth=4)
    b.run_mcmc(100, jnp.zeros(2))
    np.testing.assert_array_equal(a.super_chain, b.super_chain)


def test_escape_accept_from_out_of_support_start():
    """Same policy as HMC (review finding): H0=-inf made every leaf
    +inf-weight -> flagged divergent -> frozen at the start forever.
    The finite H0 floor lets the first in-support leaf escape-accept."""
    lp = lambda th: jnp.where(jnp.all(jnp.abs(th) < 2.0),
                              -0.5 * jnp.sum(th * th), -jnp.inf)
    x0 = jnp.full((8, 2), 5.0)
    s = bp.Nuts(lp, n_chains=8, seed=0, max_depth=6, step_size=0.5,
                adapt_gens=0)
    s.run_mcmc(300, x0)
    final = s.super_chain[:, -1, :]
    assert np.all(np.abs(final) < 2.0), final
