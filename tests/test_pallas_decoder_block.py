"""Fused DecoderBlock kernel parity vs the plain jnp composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from edm_tts_tpu.ops.pallas_decoder_block import (
    _block_ref,
    _fused_forward,
)


def _params(key, cin, cout, s):
    ks = jax.random.split(key, 8)
    alpha0 = jax.random.uniform(ks[0], (cin,), minval=0.5, maxval=1.5)
    wt = jax.random.normal(ks[1], (2 * s, cin, cout)) * 0.2
    bt = jax.random.normal(ks[2], (cout,)) * 0.1
    rus = []
    for u in range(3):
        ku = jax.random.split(ks[3 + u], 6)
        rus.append((
            jax.random.uniform(ku[0], (cout,), minval=0.5, maxval=1.5),
            jax.random.normal(ku[1], (7, cout, cout)) * 0.15,
            jax.random.normal(ku[2], (cout,)) * 0.1,
            jax.random.uniform(ku[3], (cout,), minval=0.5, maxval=1.5),
            jax.random.normal(ku[4], (1, cout, cout)) * 0.15,
            jax.random.normal(ku[5], (cout,)) * 0.1,
        ))
    return alpha0, wt, bt, tuple(rus)


@pytest.mark.parametrize("s,cin,cout,t", [
    (2, 24, 12, 61),   # odd T, tiny channels (lane padding path)
    (4, 16, 8, 40),    # multi-tile with block_f=8
    (2, 8, 8, 13),     # T < block: single ragged tile, edge masking
])
def test_fused_decoder_block_matches_ref(s, cin, cout, t):
    key = jax.random.PRNGKey(0)
    alpha0, wt, bt, rus = _params(key, cin, cout, s)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, t, cin)) * 0.5

    ref = _block_ref(x, alpha0, wt, bt, rus, stride=s)
    with pltpu.force_tpu_interpret_mode():
        out = _fused_forward(x, alpha0, wt, bt, rus, stride=s, block_f=8)

    assert out.shape == ref.shape == (2, t * s, cout)
    # kernel dots run with bf16 operands (f32 accumulation) — with f32 dots
    # forced the max diff vs the f32 reference is 3e-6 (logic-exact); the
    # tolerance here covers bf16 rounding through the 4-conv chain
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=6e-2, atol=6e-2
    )


def test_fused_decoder_block_bf16_close():
    """bf16 IO (the serving dtype) stays close to the f32 reference."""
    s, cin, cout, t = 4, 16, 8, 24
    alpha0, wt, bt, rus = _params(jax.random.PRNGKey(1), cin, cout, s)
    x = (jax.random.normal(jax.random.PRNGKey(2), (1, t, cin)) * 0.5)

    ref = _block_ref(x, alpha0, wt, bt, rus, stride=s)
    with pltpu.force_tpu_interpret_mode():
        out = _fused_forward(
            x.astype(jnp.bfloat16), alpha0, wt, bt, rus, stride=s, block_f=8
        )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.1, atol=0.1
    )
