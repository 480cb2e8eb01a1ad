"""Fused distinct-index kernel ≡ the jnp reference path, bit for bit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bipymc_tpu.ensemble.indices import distinct_from_bits
from bipymc_tpu.ops.distinct_idx import distinct_idx_pallas

INTERPRET = jax.default_backend() != "tpu"


@pytest.mark.parametrize("n_chains,k,n", [(256, 6, 2048), (16, 3, 11),
                                          (1000, 9, 37)])
def test_matches_reference(n_chains, k, n):
    bits = jax.random.bits(jax.random.key(0), (n_chains, k), jnp.uint32)
    ref = jax.vmap(lambda b: distinct_from_bits(b, k, n))(bits)
    out = distinct_idx_pallas(bits, k, n, interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_matches_reference_with_exclude():
    n_chains, k, n = 64, 2, 64
    bits = jax.random.bits(jax.random.key(1), (n_chains, k), jnp.uint32)
    gid = jnp.arange(n_chains, dtype=jnp.int32)
    ref = jax.vmap(lambda b, i: distinct_from_bits(b, k, n, exclude=i))(
        bits, gid)
    out = distinct_idx_pallas(bits, k, n, exclude=gid, interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert not np.any(np.asarray(out) == np.asarray(gid)[:, None])


def test_traced_fill():
    """n (archive fill) is traced inside the scan — must stay jittable."""
    bits = jax.random.bits(jax.random.key(2), (32, 6), jnp.uint32)

    @jax.jit
    def f(n):
        return distinct_idx_pallas(bits, 6, n, interpret=INTERPRET)

    for n in (7, 100, 8192):
        out = np.asarray(f(n))
        ref = np.asarray(jax.vmap(
            lambda b: distinct_from_bits(b, 6, n))(bits))
        np.testing.assert_array_equal(out, ref)
        assert out.min() >= 0 and out.max() < n
        assert all(len(set(row)) == 6 for row in out)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware Mosaic path")
def test_hardware_matches_reference():
    bits = jax.random.bits(jax.random.key(3), (256, 6), jnp.uint32)
    ref = jax.vmap(lambda b: distinct_from_bits(b, 6, 2048))(bits)
    out = distinct_idx_pallas(bits, 6, 2048, interpret=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
