"""Fast-poly snake vs the jnp.sin composition: the polynomial path must sit
far below bf16 resolution everywhere the codec can reach."""

import jax
import jax.numpy as jnp
import numpy as np

from edm_tts_tpu.ops.snake import cos_fast, snake, snake_exact


def test_cos_fast_accuracy_wide_range():
    u = jnp.asarray(
        np.random.default_rng(0).uniform(-500.0, 500.0, 200_000), jnp.float32
    )
    err = np.abs(np.asarray(cos_fast(u)) - np.cos(np.asarray(u, np.float64)))
    assert err.max() < 5e-6  # Cody-Waite reduction keeps error tiny at |u|~500


def test_snake_matches_exact_f32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 8.0, (4, 1000, 16)), jnp.float32)
    alpha = jnp.asarray(rng.uniform(0.05, 5.0, (16,)), jnp.float32)
    got = np.asarray(snake(x, alpha))
    ref = np.asarray(snake_exact(x, alpha))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_snake_bf16_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 2.0, (2, 64, 8)), jnp.bfloat16)
    alpha = jnp.ones((8,), jnp.bfloat16)
    got = np.asarray(snake(x, alpha), np.float32)
    ref = np.asarray(
        snake_exact(x.astype(jnp.float32), jnp.ones((8,), jnp.float32)),
        np.float32,
    )
    # bf16 input quantization dominates; poly error is invisible at this scale
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.02)
