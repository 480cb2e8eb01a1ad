"""validate_log_prob guards and profiling timing harness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bipymc_tpu.utils.debug import validate_log_prob
from bipymc_tpu.utils.profiling import time_fn, named


def good_lp(theta):
    return -0.5 * jnp.sum(theta ** 2)


def test_validate_ok():
    v = validate_log_prob(good_lp, jnp.zeros(3), check_grad=True)
    assert v == 0.0


def test_validate_rejects_vector_output():
    with pytest.raises(ValueError, match="scalar"):
        validate_log_prob(lambda t: -t ** 2, jnp.zeros(3))


def test_validate_rejects_nonfinite_start():
    with pytest.raises(ValueError, match="not finite"):
        validate_log_prob(lambda t: jnp.log(t[0]), jnp.zeros(2))


def test_validate_rejects_untraceable():
    def bad(t):
        return float(np.sum(np.asarray(t)))  # host round-trip breaks trace
    with pytest.raises(ValueError, match="jit"):
        validate_log_prob(bad, jnp.zeros(2))


def test_validate_rejects_2d_theta():
    with pytest.raises(ValueError, match="1-d"):
        validate_log_prob(good_lp, jnp.zeros((2, 2)))


def test_time_fn_blocks_and_returns():
    f = jax.jit(lambda x: x * 2.0)
    secs, out = time_fn(f, jnp.ones(4))
    assert secs >= 0.0
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_named_scope_transparent():
    f = named("likelihood")(good_lp)
    assert float(jax.jit(f)(jnp.zeros(2))) == 0.0
