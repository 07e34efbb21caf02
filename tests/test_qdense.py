"""Weight-only int8 dense: kernel parity, module compatibility, model-level
quantization (ops/qdense.py + models/quantize.py).

The serving-mode contract: quantize="none" QDense is parameter- and
bit-compatible with nn.Dense (safe swap in all existing models and
checkpoints); quantize="int8" trees are produced offline by
models/quantize.py and run the same sampler code paths.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tts_tpu.ops.qdense import (
    QDense,
    int8_dense,
    quantizable_shape,
    quantize_weight,
)


def test_quantize_weight_bounds():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 256)) * 0.05
    q, scale = quantize_weight(w)
    assert q.dtype == jnp.int8 and scale.dtype == jnp.float32
    deq = q.astype(jnp.float32) * scale[None, :]
    # round-to-nearest: per-element error <= scale/2
    err = np.abs(np.asarray(deq - w))
    assert (err <= np.asarray(scale)[None, :] * 0.5 + 1e-8).all()
    # zero column gets scale 1 and stays zero
    w0 = w.at[:, 3].set(0.0)
    q0, s0 = quantize_weight(w0)
    assert float(s0[3]) == 1.0 and not np.asarray(q0[:, 3]).any()


def test_int8_dense_xla_matches_manual():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (5, 64), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (64, 256)) * 0.1
    q, s = quantize_weight(w)
    got = int8_dense(x, q, s, implementation="xla")
    ref = x @ (q.astype(jnp.float32) * s[None, :])
    # scale-after-matmul vs dequant-before-matmul: same math, different f32
    # rounding — atol covers the near-zero outputs where rtol is meaningless
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize(
    "m,k,n", [(7, 64, 256), (33, 96, 128), (64, 32, 512), (130, 64, 384)]
)
def test_int8_dense_pallas_interpret_matches_xla(dtype, m, k, n):
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (m, k), dtype)
    w = jax.random.normal(jax.random.fold_in(key, 1), (k, n)) * 0.1
    q, s = quantize_weight(w)
    ref = int8_dense(x, q, s, implementation="xla")
    got = int8_dense(x, q, s, implementation="pallas", interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2 if dtype == jnp.bfloat16 else 1e-5, atol=1e-4,
    )


def test_int8_dense_w8a8_matches_manual():
    """w8a8 = per-row dynamic activation quant + s8xs8 dot + two-scale
    rescale; check against the explicit math."""
    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (6, 64), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (64, 256)) * 0.1
    q, s = quantize_weight(w)
    got = int8_dense(x, q, s, implementation="w8a8")
    xs = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    ref = (
        xq.astype(jnp.int32) @ q.astype(jnp.int32)
    ).astype(jnp.float32) * xs * s[None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)
    # and it approximates the float matmul to within quant error
    exact = np.asarray(x @ w)
    err = np.abs(np.asarray(got) - exact).max() / np.abs(exact).max()
    assert err < 0.02


def test_qdense_w8a8_same_param_tree_as_int8():
    """One converted checkpoint serves both quantized modes."""
    x = jnp.zeros((2, 64))
    p8 = QDense(256, quantize="int8").init(jax.random.PRNGKey(0), x)
    pw = QDense(256, quantize="w8a8").init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p8) == jax.tree_util.tree_structure(pw)


def test_int8_dense_leading_dims():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 32), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(4), (32, 128)) * 0.1
    q, s = quantize_weight(w)
    out = int8_dense(x, q, s, implementation="xla")
    assert out.shape == (2, 5, 128)


def test_qdense_none_matches_nn_dense():
    """quantize="none" must be bit-identical AND param-tree-identical to
    nn.Dense: swapping it into the conformer changes nothing for training
    or existing checkpoints."""
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 48), jnp.float32)
    ref_m = nn.Dense(72, dtype=jnp.bfloat16)
    q_m = QDense(72, dtype=jnp.bfloat16, quantize="none")
    params = ref_m.init(jax.random.PRNGKey(6), x)
    assert jax.tree_util.tree_structure(
        q_m.init(jax.random.PRNGKey(6), x)
    ) == jax.tree_util.tree_structure(params)
    ref = ref_m.apply(params, x)
    got = q_m.apply(params, x)
    assert (np.asarray(ref, np.float32) == np.asarray(got, np.float32)).all()

    # no-bias variant too (attention projections)
    ref_m = nn.Dense(72, use_bias=False)
    q_m = QDense(72, use_bias=False)
    params = ref_m.init(jax.random.PRNGKey(7), x)
    assert (
        np.asarray(ref_m.apply(params, x)) == np.asarray(q_m.apply(params, x))
    ).all()


def test_qdense_int8_params_and_fallback():
    x = jnp.zeros((2, 64))
    m = QDense(256, quantize="int8")
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    assert p["kernel_q"].dtype == jnp.int8
    assert p["kernel_scale"].shape == (256,)
    assert "kernel" not in p
    # unquantizable output width keeps the float kernel even in int8 mode
    assert not quantizable_shape(64, 60)
    m2 = QDense(60, quantize="int8")
    p2 = m2.init(jax.random.PRNGKey(0), x)["params"]
    assert "kernel" in p2 and "kernel_q" not in p2


def _tiny_s2a():
    from edm_tts_tpu.models.codec import CodecConfig
    from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig

    codec = CodecConfig(
        encoder_dim=16, decoder_dim=32, n_codebooks=4, codebook_size=64,
        codebook_dim=8, quantizer_dropout=0.0,
    )
    cfg = S2AConfig(
        hidden_size=128, num_semantic_tokens=64, encoder_num_heads=4,
        encoder_num_layers=4, injection_layers=(1, 2), residual=True,
        encoder_attn_dropout=0.0, encoder_ff_dropout=0.0,
        encoder_conv_dropout=0.0, codec=codec,
    )
    return InjectionConformer(cfg), cfg


@pytest.mark.parametrize("mode", ["int8", "w8a8"])
def test_quantize_s2a_forward_close_and_sampler_runs(mode):
    from edm_tts_tpu.models.quantize import quantize_s2a
    from edm_tts_tpu.models.s2a import s2a_sample

    model, cfg = _tiny_s2a()
    b, t = 2, 24
    ac = jax.random.randint(jax.random.PRNGKey(0), (b, cfg.num_quantizers, t), 0, 64)
    sem = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0, 64)
    rng = jax.random.PRNGKey(2)
    params = jax.jit(
        lambda r: model.init(r, ac, sem, mask_rng=r, train=False)
    )(rng)

    q_model, q_params = quantize_s2a(model, params, mode=mode)
    assert q_model.cfg.quantize == mode
    blk = q_params["params"]["block_0"]["ff1"]["Dense_0"]
    assert blk["kernel_q"].dtype == jnp.int8
    # the frozen codec passes through untouched
    assert jax.tree_util.tree_structure(
        q_params["params"]["codec"]
    ) == jax.tree_util.tree_structure(params["params"]["codec"])

    out_f = model.apply(params, ac, sem, mask_rng=rng, train=False)
    out_q = q_model.apply(q_params, ac, sem, mask_rng=rng, train=False)
    # weight-only int8: same mask path, losses close
    assert abs(float(out_f["loss"]) - float(out_q["loss"])) < 0.15 * float(
        out_f["loss"]
    )

    # the jitted MaskGIT sampler runs end to end on the quantized tree
    codes = s2a_sample(
        q_model, q_params, sem, ac[:, :, :8], sem[:, :8],
        jax.random.PRNGKey(3), steps=2,
    )
    assert codes.shape == (b, cfg.num_quantizers, t)
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < 64).all()


def test_quantize_t2s_forward_close():
    from edm_tts_tpu.models.quantize import quantize_t2s
    from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic

    cfg = T2SConfig(
        hidden_size=128, main_encoder_num_layers=2, main_encoder_num_heads=4,
        length_predictor_num_layers=1, length_predictor_num_heads=4,
        main_encoder_attn_dropout=0.0, main_encoder_ff_dropout=0.0,
        main_encoder_conv_dropout=0.0,
    )
    model = TextToSemantic(cfg)
    b, l, lt = 2, 32, 8
    ids = jax.random.randint(jax.random.PRNGKey(0), (b, l), 0, cfg.total_num_tokens)
    attn = jnp.ones((b, l), bool)
    speech = jnp.arange(l)[None, :].repeat(b, 0) >= lt + 2
    text = jax.random.randint(jax.random.PRNGKey(1), (b, lt), 5, 261)
    tmask = jnp.ones((b, lt), bool)
    slen = jnp.full((b,), float(l - lt - 2))
    rng = jax.random.PRNGKey(2)
    params = jax.jit(
        lambda r: model.init(r, ids, attn, speech, text, tmask, slen,
                             mask_rng=r, train=False)
    )(rng)
    q_model, q_params = quantize_t2s(model, params)
    out_f = model.apply(params, ids, attn, speech, text, tmask, slen,
                        mask_rng=rng, train=False)
    out_q = q_model.apply(q_params, ids, attn, speech, text, tmask, slen,
                          mask_rng=rng, train=False)
    f, q = float(out_f["loss"]), float(out_q["loss"])
    assert abs(f - q) < 0.15 * abs(f)


def test_w8a8_train_forward_matches_serving_w8a8():
    """quantize="w8a8_train" forward == int8_dense("w8a8") on the offline-
    quantized copy of the same weights (identical quant scheme)."""
    from edm_tts_tpu.ops.qdense import int8_dense, quantize_weight, w8a8_matmul_ste

    k, n, m = 64, 128, 16
    w = jax.random.normal(jax.random.PRNGKey(0), (k, n), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (m, k), jnp.float32)
    wq, ws = quantize_weight(w)
    np.testing.assert_allclose(
        np.asarray(w8a8_matmul_ste(x, w)),
        np.asarray(int8_dense(x, wq, ws, implementation="w8a8")),
        rtol=1e-6, atol=1e-6,
    )


def test_w8a8_train_grads_are_straight_through():
    """Gradients of the STE matmul == gradients of the plain matmul (the
    quantization is forward-only), for both operands."""
    from edm_tts_tpu.ops.qdense import w8a8_matmul_ste

    k, n, m = 64, 128, 8
    w = jax.random.normal(jax.random.PRNGKey(0), (k, n), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (m, k), jnp.float32)
    co = jax.random.normal(jax.random.PRNGKey(2), (m, n), jnp.float32)

    def loss_q(x, w):
        return jnp.sum(w8a8_matmul_ste(x, w) * co)

    def loss_f(x, w):
        return jnp.sum((x @ w) * co)

    gx_q, gw_q = jax.grad(loss_q, argnums=(0, 1))(x, w)
    gx_f, gw_f = jax.grad(loss_f, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_q), np.asarray(gx_f), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_q), np.asarray(gw_f), rtol=1e-5)


def test_qdense_w8a8_train_mode_trains():
    """QDense(quantize="w8a8_train") keeps the float `kernel` param (same
    tree as "none"), runs the quantized forward, and a few SGD steps reduce
    a regression loss (the STE grads point downhill despite the quantized
    forward)."""
    from edm_tts_tpu.ops.qdense import QDense, int8_dense, quantize_weight

    dense = QDense(128, quantize="w8a8_train", use_bias=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 64), jnp.float32)
    w_true = jax.random.normal(jax.random.PRNGKey(1), (64, 128)) * 0.3
    y = x @ w_true
    params = dense.init(jax.random.PRNGKey(2), x)
    assert set(params["params"]) == {"kernel", "bias"}  # no kernel_q

    # forward parity with offline w8a8 of the same kernel
    wq, ws = quantize_weight(params["params"]["kernel"])
    np.testing.assert_allclose(
        np.asarray(dense.apply(params, x)),
        np.asarray(int8_dense(x, wq, ws, implementation="w8a8"))
        + np.asarray(params["params"]["bias"]),
        rtol=1e-5, atol=1e-6,
    )

    def loss(p):
        return jnp.mean((dense.apply(p, x) - y) ** 2)

    l0 = float(loss(params))
    grad = jax.jit(jax.grad(loss))
    for _ in range(50):
        g = grad(params)
        params = jax.tree_util.tree_map(lambda p, gg: p - 2.0 * gg, params, g)
    assert float(loss(params)) < 0.1 * l0


def test_qdense_w8a8_train_unquantizable_shape_falls_back():
    """Shapes the int8 path cannot tile use the plain float matmul (exact
    nn.Dense numerics), same static gate as the serving modes."""
    from edm_tts_tpu.ops.qdense import QDense

    dense = QDense(100, quantize="w8a8_train")  # N % 128 != 0
    ref = QDense(100, quantize="none")
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 48), jnp.float32)
    params = dense.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        np.asarray(dense.apply(params, x)),
        np.asarray(ref.apply(params, x)), rtol=1e-6,
    )
