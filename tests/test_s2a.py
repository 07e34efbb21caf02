"""s2a injection Conformer: training forward + MaskGIT sampler tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tts_tpu.models.codec import CodecConfig
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig, s2a_sample

TINY_CODEC = CodecConfig(
    encoder_dim=8, decoder_dim=64, n_codebooks=6, codebook_size=32,
    codebook_dim=4, quantizer_dropout=0.0,
)
TINY = S2AConfig(
    hidden_size=64,
    num_semantic_tokens=32,
    encoder_num_heads=4,
    encoder_num_layers=6,
    injection_layers=(1, 3),
    encoder_attn_dropout=0.0,
    encoder_ff_dropout=0.0,
    encoder_conv_dropout=0.0,
    codec=TINY_CODEC,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = InjectionConformer(TINY)
    ac = jnp.zeros((1, 6, 8), jnp.int32)
    sem = jnp.zeros((1, 8), jnp.int32)
    init = jax.jit(
        lambda r, a, s, m: model.init(r, a, s, mask_rng=m, train=False)
    )
    params = init(jax.random.PRNGKey(0), ac, sem, jax.random.PRNGKey(1))
    fwd = jax.jit(
        lambda p, a, s, m: model.apply(p, a, s, mask_rng=m, train=False)
    )
    return model, params, fwd


def test_training_forward(model_and_params):
    model, params, fwd = model_and_params
    key = jax.random.PRNGKey(2)
    ac = jax.random.randint(key, (2, 6, 10), 0, 32)
    sem = jax.random.randint(key, (2, 10), 0, 32)
    out = fwd(params, ac, sem, jax.random.PRNGKey(3))
    assert out["loss"].shape == ()
    assert float(out["loss"]) > 0
    assert out["output_acoustic_codes"].shape == (2, 6, 10)


def test_training_grads_exclude_codec(model_and_params):
    model, params, fwd = model_and_params
    ac = jax.random.randint(jax.random.PRNGKey(4), (1, 6, 8), 0, 32)
    sem = jax.random.randint(jax.random.PRNGKey(5), (1, 8), 0, 32)

    def loss_fn(p):
        return model.apply(p, ac, sem, mask_rng=jax.random.PRNGKey(6), train=False)["loss"]

    grads = jax.jit(jax.grad(loss_fn))(params)
    codec_grads = grads["params"]["codec"]
    leaves = jax.tree_util.tree_leaves(codec_grads)
    assert all(float(jnp.abs(g).max()) == 0.0 for g in leaves), (
        "frozen codec must receive zero gradient (stop_gradient barrier)"
    )
    non_codec = {k: v for k, v in grads["params"].items() if k != "codec"}
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(non_codec))
    assert total > 0


def test_sampler_with_prompt(model_and_params):
    model, params, fwd = model_and_params
    sem = jax.random.randint(jax.random.PRNGKey(7), (2, 12), 0, 32)
    ac_p = jax.random.randint(jax.random.PRNGKey(8), (2, 6, 5), 0, 32)
    sem_p = jax.random.randint(jax.random.PRNGKey(9), (2, 5), 0, 32)
    codes = s2a_sample(
        model, params, sem, ac_p, sem_p, jax.random.PRNGKey(10), steps=3
    )
    assert codes.shape == (2, 6, 12)
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < 32).all()


def test_sampler_without_prompt(model_and_params):
    model, params, fwd = model_and_params
    sem = jax.random.randint(jax.random.PRNGKey(11), (1, 10), 0, 32)
    codes = s2a_sample(model, params, sem, None, None, jax.random.PRNGKey(12), steps=2)
    assert codes.shape == (1, 6, 10)


def test_sampler_deterministic_given_key(model_and_params):
    model, params, fwd = model_and_params
    sem = jax.random.randint(jax.random.PRNGKey(13), (1, 8), 0, 32)
    a = s2a_sample(model, params, sem, None, None, jax.random.PRNGKey(14), steps=3)
    b = s2a_sample(model, params, sem, None, None, jax.random.PRNGKey(14), steps=3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
