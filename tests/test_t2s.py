"""t2s model: canvas construction, training forward, sampler tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tts_tpu.models.t2s import (
    SPECIAL_TOKENS,
    T2SConfig,
    TextToSemantic,
    build_canvas,
    t2s_sample,
)

TINY = T2SConfig(
    hidden_size=64,
    semantic_vocab_size=32,
    main_encoder_num_heads=4,
    main_encoder_num_layers=2,
    length_predictor_num_heads=4,
    length_predictor_num_layers=1,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = TextToSemantic(TINY)
    b, l, lt = 1, 24, 6
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0),
        jnp.zeros((b, l), jnp.int32),
        jnp.ones((b, l), bool),
        jnp.zeros((b, l), bool),
        jnp.zeros((b, lt), jnp.int32),
        jnp.ones((b, lt), bool),
        jnp.ones((b,)),
        mask_rng=jax.random.PRNGKey(1),
        train=False,
    )
    return model, params


def test_build_canvas_layout():
    text = jnp.array([[10, 11, 12, 0]])
    canvas, attention, span = build_canvas(
        text, jnp.array([3]), jnp.array([4]), max_speech_len=6
    )
    c = np.asarray(canvas[0])
    assert c[0] == SPECIAL_TOKENS["text"]
    assert list(c[1:4]) == [10, 11, 12]
    assert c[4] == SPECIAL_TOKENS["sep"]
    assert c[5] == SPECIAL_TOKENS["speech"]
    assert (c[6:10] == SPECIAL_TOKENS["mask"]).all()
    assert c[10] == SPECIAL_TOKENS["sep"]
    assert (c[11:] == 0).all()
    assert np.asarray(span[0]).sum() == 4
    assert np.asarray(attention[0]).sum() == 11


def test_training_forward(model_and_params):
    model, params = model_and_params
    offset = TINY.semantic_offset
    text = jnp.array([[10, 11, 12, 0]], jnp.int32)
    canvas, attention, span = build_canvas(
        text, jnp.array([3]), jnp.array([8]), max_speech_len=12
    )
    # fill the span with "ground truth" semantic tokens
    sem = jax.random.randint(jax.random.PRNGKey(2), canvas.shape, 1, 32) + offset
    input_ids = jnp.where(span, sem, canvas)
    out = jax.jit(model.apply, static_argnames=("train",))(
        params,
        input_ids,
        attention,
        span,
        text,
        jnp.array([[True, True, True, False]]),
        jnp.array([8.0]),
        mask_rng=jax.random.PRNGKey(3),
        train=False,
    )
    assert np.isfinite(float(out["loss"]))
    assert float(out["length_loss"]) >= 0


def test_pad_embedding_is_zero(model_and_params):
    model, params = model_and_params
    emb = model.apply(params, jnp.array([[0, 1]]), method=TextToSemantic.embed)
    assert float(jnp.abs(emb[0, 0]).sum()) == 0.0
    assert float(jnp.abs(emb[0, 1]).sum()) > 0.0


def test_sampler_shapes_and_determinism(model_and_params):
    model, params = model_and_params
    text = jnp.array([[10, 11, 12, 13, 0, 0], [14, 15, 0, 0, 0, 0]], jnp.int32)
    tl = jnp.array([4, 2])
    out = t2s_sample(
        model, params, text, tl, jax.random.PRNGKey(4),
        pred_iters=3, max_speech_len=16,
    )
    assert out["semantic_tokens"].shape == (2, 16)
    toks = np.asarray(out["semantic_tokens"])
    valid = np.asarray(out["valid"])
    assert (toks[valid] >= 0).all() and (toks[valid] < 32).all()
    assert (toks[~valid] == 0).all()

    out2 = t2s_sample(
        model, params, text, tl, jax.random.PRNGKey(4),
        pred_iters=3, max_speech_len=16,
    )
    np.testing.assert_array_equal(toks, np.asarray(out2["semantic_tokens"]))


def test_sampler_gt_length(model_and_params):
    model, params = model_and_params
    text = jnp.array([[10, 11, 0, 0]], jnp.int32)
    out = t2s_sample(
        model, params, text, jnp.array([2]), jax.random.PRNGKey(5),
        pred_iters=2, max_speech_len=8, gt_length=jnp.array([5]),
    )
    assert int(out["lengths"][0]) == 5
    assert int(np.asarray(out["valid"][0]).sum()) == 5
