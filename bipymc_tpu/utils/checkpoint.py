"""Checkpoint / resume for sampler state pytrees.

The reference has no built-in checkpointing — users np.save chain arrays
manually (SURVEY.md §7.4). Here the sampler state is a pure pytree
(positions, log-probs, archive Z, CR weights, counters), so exact resume is
trivial: save the leaves, restore, continue the scan at ``t0 = step count``.

Two backends: a dependency-free ``.npz`` writer (leaf arrays + a pickled
treedef) and, if available, `orbax.checkpoint` for sharded/async saves.
"""

import pickle

import jax
import numpy as np


def save_state(path, state, step=0):
    """Save a sampler state pytree to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        pickle.dumps(treedef), dtype=np.uint8)
    arrays["__step__"] = np.asarray(step)
    np.savez(path, **arrays)


def load_state(path):
    """Load a state saved by :func:`save_state` → (state, step)."""
    with np.load(path, allow_pickle=False) as data:
        treedef = pickle.loads(data["__treedef__"].tobytes())
        n = len([k for k in data.files if k.startswith("leaf_")])
        leaves = [jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(n)]
        step = int(data["__step__"])
    return _unflatten_migrating(treedef, leaves), step


def _unflatten_migrating(treedef, leaves):
    """tree_unflatten with migration for state-layout changes.

    Checkpoints are positional leaves + a treedef pinned to the class *as
    it was at save time*; a field added later makes plain unflatten fail.
    Known migration: DreamState gained ``cr_cum`` (round 2) — derivable
    from ``cr_p``, so old 10-leaf DREAM checkpoints restore exactly.
    """
    try:
        return jax.tree_util.tree_unflatten(treedef, leaves)
    except (TypeError, ValueError):
        if "DreamState" in str(treedef) and len(leaves) == 10:
            from bipymc_tpu.ensemble.archive import Archive
            from bipymc_tpu.samplers.dream import DreamState
            (x, logp, buf, fill, head, cr_p,
             cr_jump, cr_count, logp_sum, gen) = leaves
            cr_cum = jax.numpy.cumsum(cr_p / jax.numpy.sum(cr_p))
            return DreamState(x=x, logp=logp,
                              archive=Archive(buf=buf, fill=fill, head=head),
                              cr_p=cr_p, cr_cum=cr_cum, cr_jump=cr_jump,
                              cr_count=cr_count, logp_sum=logp_sum, gen=gen)
        raise


def save_state_orbax(path, state, step=0):
    """Orbax backend: async-capable, handles sharded (mesh) state leaves
    natively. ``path`` is a directory. Treedef goes in a sidecar pickle
    (orbax restores raw containers, not NamedTuples)."""
    import os
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"),
                   {f"leaf_{i}": leaf for i, leaf in enumerate(leaves)},
                   force=True)
    with open(os.path.join(path, "meta.pkl"), "wb") as f:
        pickle.dump({"treedef": treedef, "step": int(step)}, f)


def load_state_orbax(path):
    """Load a checkpoint saved by :func:`save_state_orbax` → (state, step)."""
    import os
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.pkl"), "rb") as f:
        meta = pickle.load(f)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.join(path, "state"))
    n = len(restored)
    leaves = [jax.numpy.asarray(restored[f"leaf_{i}"]) for i in range(n)]
    return _unflatten_migrating(meta["treedef"], leaves), meta["step"]


def save_sampler(path, sampler):
    """Checkpoint an API-level sampler (state + step counter)."""
    save_state(path, sampler.final_state, step=sampler._steps_run)


def restore_sampler(path, sampler):
    """Restore a checkpoint into a freshly constructed sampler.

    The sampler must be built with the same configuration; its next
    ``run_mcmc`` continues from the restored state and step count.
    """
    state, step = load_state(path)
    n_ck = getattr(state, "x", getattr(state, "theta", None))
    if n_ck is None:  # tempered: positions live on state.kernel.theta
        n_ck = getattr(getattr(state, "kernel", None), "theta", None)
    # leading axes: [n_chains, d], or [n_temps, n_chains, d] for tempered
    want = (getattr(sampler, "n_temps", None), sampler.n_chains) \
        if hasattr(sampler, "n_temps") else (sampler.n_chains,)
    if n_ck is not None and hasattr(sampler, "n_chains") and (
            n_ck.ndim != len(want) + 1
            or tuple(n_ck.shape[:len(want)]) != want):
        # too few leading axes is as wrong as a mismatched count: e.g. a
        # plain [n_chains, d] RW checkpoint restored into a tempered
        # sampler would otherwise fail later with an opaque vmap error
        raise ValueError(
            f"checkpoint position shape {tuple(n_ck.shape)} does not match "
            f"sampler layout {want} + (d,)")
    sampler._final_state = state
    sampler._steps_run = step
    return sampler
