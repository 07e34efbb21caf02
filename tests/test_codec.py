"""Codec invariants: shapes, RVQ semantics, round-trip consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tts_tpu.models.codec import Codec, CodecConfig, ResidualVQ, pad_audio_to_hop

TINY = CodecConfig(
    encoder_dim=8,
    decoder_dim=64,
    n_codebooks=4,
    codebook_size=32,
    codebook_dim=4,
    quantizer_dropout=0.5,
)


@pytest.fixture(scope="module")
def codec_and_params():
    codec = Codec(TINY)
    audio = jnp.zeros((1, 1920, 1))
    params = jax.jit(codec.init)(jax.random.PRNGKey(0), audio)
    return codec, params


def test_round_trip_shapes(codec_and_params):
    codec, params = codec_and_params
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, 1920, 1)) * 0.1
    out = codec.apply(params, audio)
    t50 = 1920 // TINY.hop_length
    assert out["codes"].shape == (2, TINY.n_codebooks, t50)
    assert out["z"].shape == (2, t50, TINY.latent_dim)
    assert out["audio"].shape == (2, 1920, 1)
    assert np.isfinite(np.asarray(out["audio"])).all()
    assert (np.asarray(out["codes"]) >= 0).all()
    assert (np.asarray(out["codes"]) < TINY.codebook_size).all()


def test_forward_z_equals_from_codes(codec_and_params):
    """At eval, the straight-through output equals the codes' features."""
    codec, params = codec_and_params
    audio = jax.random.normal(jax.random.PRNGKey(2), (2, 1920, 1)) * 0.1
    out = codec.apply(params, audio, method="encode")
    z_from_codes = codec.apply(params, out["codes"], method="codes_to_features")
    np.testing.assert_allclose(
        np.asarray(out["z"]), np.asarray(z_from_codes), atol=1e-5, rtol=1e-5
    )


def test_from_codes_unreduced_sums_to_from_codes(codec_and_params):
    codec, params = codec_and_params
    codes = jax.random.randint(jax.random.PRNGKey(3), (2, 4, 6), 0, 32)
    reduced = codec.apply(params, codes, method="codes_to_features")
    unreduced = codec.apply(params, codes, method="codes_to_features_unreduced")
    np.testing.assert_allclose(
        np.asarray(unreduced.sum(axis=1)), np.asarray(reduced), atol=1e-5, rtol=1e-5
    )
    # fewer leading levels must also work (s2a dynamic injection path)
    partial = codec.apply(params, codes[:, :2], method="codes_to_features")
    assert partial.shape == reduced.shape


def test_features_to_codebook_logits_argmin_matches_codes(codec_and_params):
    """Residual distances computed from the raw encoder latents must retrace
    the exact code path of the forward quantization."""
    codec, params = codec_and_params
    audio = jax.random.normal(jax.random.PRNGKey(4), (1, 1920, 1)) * 0.1
    out = codec.apply(params, audio, method="encode")
    dists = codec.apply(params, out["z_e"], method="features_to_codebook_logits")
    assert dists.shape == (1, 6, TINY.n_codebooks, TINY.codebook_size)
    recovered = jnp.argmin(dists, axis=-1).transpose(0, 2, 1)
    np.testing.assert_array_equal(np.asarray(recovered), np.asarray(out["codes"]))


def test_from_latents_recovers_codes(codec_and_params):
    """``features_to_codes`` on the forward's projected latents recovers the
    forward's codes exactly (reference from_latents contract)."""
    codec, params = codec_and_params
    audio = jax.random.normal(jax.random.PRNGKey(20), (1, 1920, 1)) * 0.1
    out = codec.apply(params, audio, method="encode")
    b, t, q, dc = out["latents"].shape
    codes = codec.apply(
        params, out["latents"].reshape(b, t, q * dc), method="features_to_codes"
    )
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(out["codes"]))


def test_quantizer_dropout_masks_some_samples():
    rvq = ResidualVQ(input_dim=16, n_codebooks=4, codebook_size=16,
                     codebook_dim=4, quantizer_dropout=1.0)
    z = jax.random.normal(jax.random.PRNGKey(5), (4, 8, 16))
    params = rvq.init(jax.random.PRNGKey(6), z)
    thr = rvq.apply(
        params, jax.random.PRNGKey(7), 4, None, True,
        method="active_level_thresholds",
    )
    thr = np.asarray(thr)
    assert ((thr >= 1) & (thr <= 4)).all()  # all samples get dropout draws
    out_train = rvq.apply(params, z, train=True, rng=jax.random.PRNGKey(8))
    assert np.isfinite(float(out_train["vq/commitment_loss"]))


def test_straight_through_gradient_flows():
    rvq = ResidualVQ(input_dim=16, n_codebooks=2, codebook_size=16, codebook_dim=4)
    z = jax.random.normal(jax.random.PRNGKey(9), (1, 8, 16))
    params = rvq.init(jax.random.PRNGKey(10), z)

    def loss(z):
        return jnp.sum(jnp.square(rvq.apply(params, z)["z"]))

    g = jax.grad(loss)(z)
    assert float(jnp.abs(g).sum()) > 0.0


def test_pad_audio_to_hop():
    a = jnp.ones((1, 321, 1))
    assert pad_audio_to_hop(a, 320).shape == (1, 640, 1)
    a = jnp.ones((1, 640, 1))
    assert pad_audio_to_hop(a, 320).shape == (1, 640, 1)
