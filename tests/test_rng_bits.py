"""Bit-block RNG utilities (core/rng.py).

The DREAM engine draws all per-generation randomness as one batched
``random.bits`` block and converts words with these helpers; they must
match the laws of the per-site ``jax.random`` calls they replaced.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bipymc_tpu.core.rng import bits_to_normal, bits_to_uniform
from bipymc_tpu.ensemble.indices import distinct_from_bits, sample_distinct


def test_bits_to_uniform_law():
    bits = jax.random.bits(jax.random.key(0), (200_000,), jnp.uint32)
    u = np.asarray(bits_to_uniform(bits))
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 3e-3
    assert abs(u.var() - 1.0 / 12.0) < 1e-3
    # exact construction: top-23-bit mantissa of [1,2) minus 1
    b = np.asarray(bits[:100])
    expect = (np.uint32(b >> 9) | np.uint32(0x3F800000)).view(np.float32) - 1
    np.testing.assert_array_equal(u[:100], expect)


def test_bits_to_uniform_extremes():
    ends = jnp.array([0, 2**32 - 1], dtype=jnp.uint32)
    u = np.asarray(bits_to_uniform(ends))
    assert u[0] == 0.0 and u[1] < 1.0


def test_bits_to_normal_law():
    bits = jax.random.bits(jax.random.key(1), (500_000,), jnp.uint32)
    n = np.asarray(bits_to_normal(bits))
    assert np.all(np.isfinite(n))
    assert abs(n.mean()) < 6e-3
    assert abs(n.std() - 1.0) < 5e-3
    # worst-case word stays finite (clamped one ulp off -1, like
    # jax.random.normal's open-interval uniform)
    worst = np.asarray(bits_to_normal(jnp.zeros((1,), jnp.uint32)))
    assert np.isfinite(worst).all() and worst[0] < -5.0


def test_distinct_from_bits_matches_sample_distinct():
    for seed in range(5):
        key = jax.random.key(seed)
        a = sample_distinct(key, 6, 137, exclude=40)
        bits = jax.random.bits(key, (6,), jnp.uint32)
        b = distinct_from_bits(bits, 6, 137, exclude=40)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sub_f32_dtypes_stay_half_open():
    """bf16/f16 casts round — must never hit exactly 1.0 (inf through
    erf⁻¹, log(u)=0 never-accept) nor land the normal clamp on −1."""
    from bipymc_tpu.core.rng import uniform_to_normal
    # force the worst case: the largest representable f32 below 1
    worst = jnp.full((8,), 0xFFFFFFFF, jnp.uint32)
    bits = jnp.concatenate([
        worst, jax.random.bits(jax.random.key(3), (50_000,), jnp.uint32)])
    for dtype in (jnp.bfloat16, jnp.float16):
        u = bits_to_uniform(bits, dtype)
        assert float(jnp.max(u)) < 1.0, dtype
        n = uniform_to_normal(u)
        nz = uniform_to_normal(bits_to_uniform(
            jnp.zeros((4,), jnp.uint32), dtype))
        assert bool(jnp.all(jnp.isfinite(n))), dtype
        assert bool(jnp.all(jnp.isfinite(nz))), dtype


def test_cr_inverse_cdf_selection_law():
    """The engine's inverse-CDF CR pick must follow the cr_p weights."""
    cr_p = jnp.array([0.6, 0.3, 0.1])
    u = bits_to_uniform(
        jax.random.bits(jax.random.key(2), (100_000,), jnp.uint32))
    cum = jnp.cumsum(cr_p / jnp.sum(cr_p))
    idx = jnp.minimum(jnp.sum(u[:, None] >= cum[None, :], axis=1), 2)
    freq = np.bincount(np.asarray(idx), minlength=3) / u.shape[0]
    np.testing.assert_allclose(freq, np.asarray(cr_p), atol=5e-3)
