"""Black-box (host-side) likelihoods inside jitted samplers.

The reference accepts ANY Python callable as the log-likelihood — its hot
loop is a NumPy for-loop, so external simulators, legacy Fortran wrappers
or file-based models just work (SURVEY.md §5.1: "log_like(theta') — user
callback"). This framework's samplers run inside ``jax.jit``/``lax.scan``
and normally require a traceable function; :func:`external_log_like`
restores the reference's capability by routing the likelihood through
``jax.pure_callback``.

Cost model: one host round-trip per *generation* (not per chain) — under
``vmap`` the callback batches, so a 256-chain population still makes a
single host call per generation, which is exactly the reference's
rank-0-farms-the-pool execution shape. Use only when the likelihood
cannot be expressed in JAX; a traceable likelihood stays on device and is
orders of magnitude faster.
"""

import jax
import numpy as np


def external_log_like(fn, batched: bool = False, dtype=None):
    """Wrap a host-side log-likelihood for use inside jitted samplers.

    fn: NumPy-level callable. With ``batched=False`` (default) it maps a
    single parameter vector [d] → scalar, and batching loops on the host.
    With ``batched=True`` it must map [n, d] → [n] itself (vectorised or
    process-pool implementations slot in here).
    dtype: result dtype (default: argument dtype).

    Returns a JAX-traceable ``log_like(theta)`` usable with every sampler
    in this package (vmap/scan/jit safe; under a sharded mesh each shard
    calls back with its local chains).
    """
    def host_eval(theta_np):
        theta_np = np.asarray(theta_np)
        if theta_np.ndim == 1:
            # honour the batched contract ([n, d] -> [n]) even for a
            # single un-vmapped evaluation
            if batched:
                return np.asarray(fn(theta_np[None]))[0]
            return np.asarray(fn(theta_np))
        flat = theta_np.reshape(-1, theta_np.shape[-1])
        if batched:
            out = np.asarray(fn(flat))
        else:
            out = np.asarray([fn(row) for row in flat])
        return out.reshape(theta_np.shape[:-1])

    def log_like(theta):
        out_dtype = dtype or theta.dtype
        result_shape = jax.ShapeDtypeStruct(theta.shape[:-1], out_dtype)
        return jax.pure_callback(
            lambda th: host_eval(th).astype(out_dtype), result_shape,
            theta, vmap_method="expand_dims")

    return log_like


def external_log_like_masked(fn, batched: bool = False, dtype=None,
                             fill: float = 0.0):
    """Masked variant for delayed acceptance (samplers/da.py).

    Returns ``log_like(theta, mask)``: the host only evaluates rows whose
    ``mask`` is True — the point of DA is that stage-1-rejected proposals
    never reach the expensive simulator. Masked-out rows return ``fill``
    (their value is ignored by the DA accept rule). Same batching
    contract as :func:`external_log_like`; under ``vmap`` the whole
    population still costs ONE host callback per step, now touching only
    the promoted subset.
    """
    def host_eval(theta_np, mask_np):
        theta_np = np.asarray(theta_np)
        # an unbatched-constant mask under vmap arrives with a size-1
        # batch dim (expand_dims semantics) — broadcast it to the rows
        mask_np = np.broadcast_to(np.asarray(mask_np).astype(bool),
                                  theta_np.shape[:-1])
        if theta_np.ndim == 1:
            if not mask_np:
                return np.asarray(fill)
            if batched:
                return np.asarray(fn(theta_np[None]))[0]
            return np.asarray(fn(theta_np))
        flat = theta_np.reshape(-1, theta_np.shape[-1])
        mflat = mask_np.reshape(-1)
        out = np.full(flat.shape[0], fill, dtype=np.result_type(flat))
        if mflat.any():
            if batched:
                out[mflat] = np.asarray(fn(flat[mflat]))
            else:
                out[mflat] = [fn(row) for row in flat[mflat]]
        return out.reshape(theta_np.shape[:-1])

    def log_like(theta, mask):
        out_dtype = dtype or theta.dtype
        result_shape = jax.ShapeDtypeStruct(theta.shape[:-1], out_dtype)
        return jax.pure_callback(
            lambda th, mk: host_eval(th, mk).astype(out_dtype),
            result_shape, theta, mask, vmap_method="expand_dims")

    return log_like
