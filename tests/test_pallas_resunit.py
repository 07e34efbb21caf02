"""Fused Pallas ResidualUnit parity vs the plain jnp composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tts_tpu.ops.pallas_resunit import _fused_forward, _resunit_ref


@pytest.mark.parametrize("dilation", [1, 3, 9])
def test_fused_matches_reference(dilation):
    rng = np.random.default_rng(0)
    c, t = 64, 300
    x = jnp.asarray(rng.standard_normal((2, t, c)), jnp.float32)
    a1 = jnp.asarray(rng.standard_normal(c) * 0.1 + 1.0)
    a2 = jnp.asarray(rng.standard_normal(c) * 0.1 + 1.0)
    w7 = jnp.asarray(rng.standard_normal((7, c, c)) * 0.05)
    w1 = jnp.asarray(rng.standard_normal((1, c, c)) * 0.05)
    b7 = jnp.asarray(rng.standard_normal(c) * 0.01)
    b1 = jnp.asarray(rng.standard_normal(c) * 0.01)

    ref = _resunit_ref(x, a1, w7, b7, a2, w1, b1, dilation=dilation)
    # interpret mode on CPU via the pallas interpreter
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = _fused_forward(x, a1, w7, b7, a2, w1, b1, dilation=dilation,
                             block_t=128)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2
    )


def test_residual_unit_param_layout_stable():
    """The module exposes the same outputs with pallas on/off and one tree."""
    from edm_tts_tpu.models.codec.layers import ResidualUnit

    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 64, 16)),
                    jnp.float32)
    unit = ResidualUnit(16, dilation=3, use_pallas=False)
    params = jax.jit(unit.init)(jax.random.PRNGKey(0), x)
    keys = set(params["params"].keys())
    assert keys == {"alpha1", "conv7_v", "conv7_g", "conv7_b",
                    "alpha2", "conv1_v", "conv1_g", "conv1_b"}
    y = unit.apply(params, x)
    assert np.isfinite(np.asarray(y)).all()


def test_fused_gradient_matches_reference():
    """custom_vjp backward == grad of the jnp composition."""
    rng = np.random.default_rng(2)
    c, t = 16, 96
    x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
    a1 = jnp.ones(c)
    a2 = jnp.ones(c)
    w7 = jnp.asarray(rng.standard_normal((7, c, c)) * 0.05)
    w1 = jnp.asarray(rng.standard_normal((1, c, c)) * 0.05)
    b7 = jnp.zeros(c)
    b1 = jnp.zeros(c)

    from edm_tts_tpu.ops.pallas_resunit import fused_residual_unit
    from jax.experimental.pallas import tpu as pltpu

    def loss_fused(x, w7, w1):
        return jnp.sum(fused_residual_unit(x, a1, w7, b7, a2, w1, b1, 3) ** 2)

    def loss_ref(x, w7, w1):
        return jnp.sum(_resunit_ref(x, a1, w7, b7, a2, w1, b1, dilation=3) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w7, w1)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w7, w1)
    # the fused forward uses bf16 matmuls, so d/dx sum(f(x)^2) = 2 f(x) f'(x)
    # carries bf16-level noise relative to the f32 reference forward
    for a, b in zip(g_fused, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.9999
        np.testing.assert_allclose(a, b, atol=0.05, rtol=0.05)
