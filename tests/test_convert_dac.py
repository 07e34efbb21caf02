"""Differential parity: flax codec vs the actual reference torch DAC.

Instantiates the reference ``DAC`` (modeling_dac.py:22-235) on CPU with a
tiny random-init config, imports its weights via
``models/codec/convert.from_torch_state_dict``, and asserts the full
inference API line up: encode->codes (bit), decode-from-codes (tolerance),
codes_to_features(_unreduced), features_to_codes (from_latents), and
features_to_codebook_logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.codec.convert import from_torch_state_dict

from reference_torch import install_reference_path

install_reference_path()

from edm_tts.models.dac.configuration import DACConfig  # noqa: E402
from edm_tts.models.dac.modeling_dac import DAC  # noqa: E402

TINY = dict(
    encoder_dim=8,
    encoder_rates=[2, 4, 5, 8],
    decoder_dim=96,
    decoder_rates=[8, 5, 4, 2],
    n_codebooks=3,
    codebook_size=16,
    codebook_dim=4,
    quantizer_dropout=0.0,
)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    ref = DAC(DACConfig(**TINY)).eval()
    cfg = CodecConfig(
        encoder_dim=TINY["encoder_dim"],
        encoder_rates=tuple(TINY["encoder_rates"]),
        decoder_dim=TINY["decoder_dim"],
        decoder_rates=tuple(TINY["decoder_rates"]),
        n_codebooks=TINY["n_codebooks"],
        codebook_size=TINY["codebook_size"],
        codebook_dim=TINY["codebook_dim"],
        quantizer_dropout=0.0,
    )
    model = Codec(cfg)
    variables = from_torch_state_dict(cfg, ref.state_dict())
    variables = jax.tree.map(jnp.asarray, variables)
    return ref, model, variables, cfg


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(0)
    return (0.5 * rng.standard_normal((2, 3200, 1))).astype(np.float32)


def test_encode_to_codes_bit_parity(pair, audio):
    ref, model, variables, _ = pair
    with torch.no_grad():
        ref_codes = ref.encode_to_codes(
            torch.from_numpy(np.transpose(audio, (0, 2, 1)))
        ).numpy()
    codes = np.asarray(
        jax.jit(lambda v, a: model.apply(v, a, method=Codec.encode_to_codes))(
            variables, jnp.asarray(audio)
        )
    )
    np.testing.assert_array_equal(codes, ref_codes)


def test_decode_from_codes_parity(pair, audio):
    ref, model, variables, _ = pair
    with torch.no_grad():
        codes = ref.encode_to_codes(torch.from_numpy(np.transpose(audio, (0, 2, 1))))
        ref_audio = ref.decode_from_codes(codes, length=audio.shape[1]).numpy()
    out = np.asarray(
        jax.jit(lambda v, c: model.apply(v, c, method=Codec.decode_from_codes))(
            variables, jnp.asarray(codes.numpy())
        )
    )[:, : audio.shape[1]]
    np.testing.assert_allclose(
        np.transpose(out, (0, 2, 1)), ref_audio, atol=2e-5, rtol=1e-4
    )


def test_codes_to_features_parity(pair, audio):
    ref, model, variables, _ = pair
    with torch.no_grad():
        codes = ref.encode_to_codes(torch.from_numpy(np.transpose(audio, (0, 2, 1))))
        ref_z = ref.codes_to_features(codes).numpy()  # (B, D, T)
        ref_zu = ref.codes_to_features_unreduced(codes).numpy()  # (B, Q, D, T)
    z = np.asarray(
        jax.jit(lambda v, c: model.apply(v, c, method=Codec.codes_to_features))(
            variables, jnp.asarray(codes.numpy())
        )
    )
    np.testing.assert_allclose(np.transpose(z, (0, 2, 1)), ref_z, atol=1e-5, rtol=1e-4)
    zu = np.asarray(
        jax.jit(
            lambda v, c: model.apply(v, c, method=Codec.codes_to_features_unreduced)
        )(variables, jnp.asarray(codes.numpy()))
    )
    np.testing.assert_allclose(
        np.transpose(zu, (0, 1, 3, 2)), ref_zu, atol=1e-5, rtol=1e-4
    )

    # partial levels (the s2a dynamic-injection path uses Q' < Q)
    with torch.no_grad():
        ref_z2 = ref.codes_to_features(codes[:, :2]).numpy()
    z2 = np.asarray(
        jax.jit(lambda v, c: model.apply(v, c, method=Codec.codes_to_features))(
            variables, jnp.asarray(codes.numpy()[:, :2])
        )
    )
    np.testing.assert_allclose(
        np.transpose(z2, (0, 2, 1)), ref_z2, atol=1e-5, rtol=1e-4
    )


def test_features_to_codes_parity(pair, audio):
    """from_latents: latents (projected, pre-quantization) -> codes."""
    ref, model, variables, _ = pair
    with torch.no_grad():
        enc = ref.encoder(torch.from_numpy(np.transpose(audio, (0, 2, 1))))
        latents = ref.quantizer(enc)["latents"]  # (B, Q*dc, T)
        ref_codes = ref.features_to_codes(latents).numpy()
    # ours takes (B, T, Q*dc) with per-level slices on the last axis
    mine = np.asarray(
        jax.jit(lambda v, f: model.apply(v, f, method=Codec.features_to_codes))(
            variables, jnp.asarray(np.transpose(latents.numpy(), (0, 2, 1)))
        )
    )
    np.testing.assert_array_equal(mine, ref_codes)


def test_features_to_codebook_logits_parity(pair, audio):
    ref, model, variables, _ = pair
    with torch.no_grad():
        enc = ref.encoder(torch.from_numpy(np.transpose(audio, (0, 2, 1))))
        ref_dist = ref.features_to_codebook_logits(enc).numpy()  # (B,T,Q,N)
    mine = np.asarray(
        jax.jit(
            lambda v, f: model.apply(v, f, method=Codec.features_to_codebook_logits)
        )(variables, jnp.asarray(np.transpose(enc.numpy(), (0, 2, 1))))
    )
    np.testing.assert_allclose(mine, ref_dist, atol=5e-5, rtol=1e-4)


def test_eval_forward_losses_parity(pair, audio):
    """Full eval-mode pass: z and VQ losses match the reference forward."""
    ref, model, variables, _ = pair
    with torch.no_grad():
        enc = ref.encoder(torch.from_numpy(np.transpose(audio, (0, 2, 1))))
        ref_out = ref.quantizer(enc)
    out = jax.jit(
        lambda v, a: model.apply(v, a, method=Codec.encode), static_argnums=()
    )(variables, jnp.asarray(audio))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out["z"]), (0, 2, 1)),
        ref_out["z"].numpy(),
        atol=2e-5,
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(out["vq/commitment_loss"]),
        float(ref_out["vq/commitment_loss"]),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(out["vq/codebook_loss"]), float(ref_out["vq/codebook_loss"]), rtol=1e-4
    )
