"""Fused Metropolis accept/update for the DREAM engine.

After the likelihood, the per-generation tail — acceptance ratio with the
snooker Jacobian, the non-finite hard-reject, the position/log-prob
selects and the outlier-statistic update — is another handful of small
XLA fusions inside the scan. This kernel runs the whole chain in one VPU
launch. Every op is EXACT (compare / select / min / add — the log of the
accept uniform stays outside in XLA), so the fused and jnp paths are
bit-identical and goldens are unaffected, unlike the float-reassociating
proposal kernel.

Layout: chains on sublanes (grid-blocked like ops/dream_proposal.py),
dims on lanes; the five per-chain scalars ride one [n, 128] array in and
the three result scalars ride one out.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bipymc_tpu.ops.tiling import round_up

_BC = 128
_LANE = 128

# packed scalar lanes: inputs [logp, logp_star, log_jac, log_u, logp_sum]
_I_LP, _I_LPS, _I_JAC, _I_LU, _I_SUM = 0, 1, 2, 3, 4
# outputs [logp_new, logp_sum_new, accepted]
_O_LP, _O_SUM, _O_ACC = 0, 1, 2


def _kernel(x_ref, xs_ref, vec_ref, xnew_ref, out_ref):
    v = vec_ref[:]
    logp = v[:, _I_LP:_I_LP + 1]
    logp_star = v[:, _I_LPS:_I_LPS + 1]
    log_jac = v[:, _I_JAC:_I_JAC + 1]
    log_u = v[:, _I_LU:_I_LU + 1]
    logp_sum = v[:, _I_SUM:_I_SUM + 1]

    log_alpha = jnp.minimum(0.0, logp_star - logp + log_jac)
    finite = (logp_star == logp_star) & \
        (jnp.abs(logp_star) < jnp.inf)
    acc = finite & (log_u < log_alpha)            # [BC, 1]

    xnew_ref[:] = jnp.where(acc, xs_ref[:], x_ref[:])
    logp_new = jnp.where(acc, logp_star, logp)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    out = jnp.where(lane == _O_LP, logp_new, 0.0)
    out = jnp.where(lane == _O_SUM, logp_sum + logp_new, out)
    out_ref[:] = jnp.where(lane == _O_ACC, acc.astype(v.dtype), out)


@functools.partial(jax.jit, static_argnames=("interpret",))
def accept_select_pallas(x, x_star, logp, logp_star, log_jac, log_u,
                         logp_sum, interpret=False):
    """One-launch Metropolis accept + state update.

    Returns (x_new [n,d], logp_new [n], logp_sum_new [n], accepted [n]
    bool) — bit-identical to the unfused jnp chain in samplers/dream.py.
    """
    n, d = x.shape
    n_p = round_up(n, _BC)
    d_p = round_up(d, _LANE)
    pad = lambda a: jnp.pad(a, ((0, n_p - n), (0, d_p - d)))
    vec = jnp.stack([logp, logp_star, log_jac, log_u, logp_sum], axis=1)
    vec_p = jnp.pad(vec, ((0, n_p - n), (0, _LANE - vec.shape[1])))

    nd_spec = pl.BlockSpec((_BC, d_p), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((_BC, _LANE), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    x_new, out = pl.pallas_call(
        _kernel,
        grid=(n_p // _BC,),
        in_specs=[nd_spec, nd_spec, sc_spec],
        out_specs=[nd_spec, sc_spec],
        out_shape=[jax.ShapeDtypeStruct((n_p, d_p), x.dtype),
                   jax.ShapeDtypeStruct((n_p, _LANE), x.dtype)],
        interpret=interpret,
    )(pad(x), pad(x_star), vec_p)
    return (x_new[:n, :d], out[:n, _O_LP], out[:n, _O_SUM],
            out[:n, _O_ACC] > 0.5)
