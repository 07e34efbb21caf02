"""Differential parity for ops/resample.py (the prompt-path resampler).

The reference resamples speaker prompts / training audio with torchaudio's
windowed-sinc resampler (sinc_interp_hann, lowpass_filter_width=6,
rolloff=0.99): /root/reference/edm_tts/models/dac/modeling_dac.py:88,
/root/reference/edm_tts/datasets/audio_loading_utils.py:68. torchaudio is
not importable here, so parity is pinned with two independent oracles plus
a token-level end-to-end check:

1. a *dense* evaluation of the continuous-time windowed-sinc interpolation
   formula (one output sample at a time, no polyphase, no conv) — catches
   indexing/padding/phase-order bugs in the strided-conv restructuring;
2. analytic ground truth on pure tones — catches kernel-design bugs the
   dense oracle would share (it proves the filter actually interpolates);
3. token agreement through ``compute_codes_from_file``: the same
   bandlimited signal sampled natively at 16 kHz vs resampled from 44.1 kHz
   must tokenize (nearly) identically through a tiny codec + HuBERT stack.
"""

import math

import numpy as np
import pytest

from edm_tts_tpu.ops.resample import resample_numpy

L = 6  # lowpass_filter_width
ROLLOFF = 0.99


def _direct_sinc_resample(x, orig_freq, new_freq):
    """Dense windowed-sinc interpolation: y[i] = sum_j x[j] * w(j - tau_i),
    tau_i = i * orig / new (input-sample units), w = scaled hann-windowed
    sinc clipped at +-L — the defining formula, evaluated directly."""
    g = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // g, new_freq // g
    base = min(orig, new) * ROLLOFF
    scale = base / orig
    support = L / scale
    out_len = int(math.ceil(len(x) * new / orig))
    xf = np.asarray(x, np.float64)
    y = np.zeros(out_len, np.float64)
    for i in range(out_len):
        tau = i * orig / new
        js = np.arange(
            max(int(math.ceil(tau - support)), 0),
            min(int(math.floor(tau + support)), len(x) - 1) + 1,
        )
        t = np.clip((js - tau) * scale, -L, L)
        window = np.cos(t * math.pi / L / 2) ** 2
        tpi = t * np.pi
        kernel = np.where(tpi == 0, 1.0, np.sin(tpi) / np.where(tpi == 0, 1.0, tpi))
        y[i] = np.sum(xf[js] * kernel * window * scale)
    return y.astype(np.float32)


@pytest.mark.parametrize(
    "orig,new",
    [(24000, 16000), (44100, 16000), (48000, 16000), (16000, 24000)],
)
def test_polyphase_matches_dense_formula(orig, new):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(2000).astype(np.float32)
    got = resample_numpy(x, orig, new)
    want = _direct_sinc_resample(x, orig, new)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)


@pytest.mark.parametrize("orig", [24000, 44100, 48000])
def test_tone_analytic_ground_truth(orig):
    """Resampling a bandlimited tone mix must reproduce the analytic signal
    on the 16 kHz grid (away from the edge transients)."""
    new = 16000
    dur = 0.25
    freqs = [440.0, 1333.0, 3777.0]

    def sig(ts):
        return sum(np.sin(2 * np.pi * f * ts) for f in freqs) / len(freqs)

    x = sig(np.arange(int(dur * orig)) / orig).astype(np.float32)
    y = resample_numpy(x, orig, new)
    ideal = sig(np.arange(y.shape[0]) / new)
    edge = 64  # skip filter warmup at both ends
    err = np.abs(y[edge:-edge] - ideal[edge:-edge])
    assert err.max() < 5e-3, f"max tone error {err.max():.2e}"


def test_token_agreement_44k_vs_native_16k(tmp_path):
    """End-to-end: a 44.1 kHz prompt file must tokenize (nearly) identically
    to the same signal sampled natively at 16 kHz — the exact reference
    prompt path (compute_codes_from_file -> resample -> tokenize)."""
    import jax
    import jax.numpy as jnp

    from tests.flac_encoder import encode_flac

    from edm_tts_tpu.models.codec import Codec, CodecConfig
    from edm_tts_tpu.models.hubert import HubertModel
    from edm_tts_tpu.models.hubert.config import HubertConfig
    from edm_tts_tpu.models.tokenizer import AudioTokenizer, SemanticTokenizerHubert

    rng = np.random.default_rng(1)
    freqs = rng.uniform(80.0, 6000.0, size=40)
    phases = rng.uniform(0, 2 * np.pi, size=40)
    amps = rng.uniform(0.2, 1.0, size=40)

    def sig(ts):
        acc = np.zeros_like(ts)
        for f, p, a in zip(freqs, phases, amps):
            acc += a * np.sin(2 * np.pi * f * ts + p)
        return 0.5 * acc / np.abs(acc).max()

    dur = 1.0
    x44 = sig(np.arange(int(dur * 44100)) / 44100)
    x16 = sig(np.arange(int(dur * 16000)) / 16000)

    f44 = tmp_path / "p44.flac"
    f16 = tmp_path / "p16.flac"
    f44.write_bytes(encode_flac((x44 * 32000)[None].astype(np.int64), 44100))
    f16.write_bytes(encode_flac((x16 * 32000)[None].astype(np.int64), 16000))

    codec_cfg = CodecConfig(encoder_dim=4, decoder_dim=32, n_codebooks=2,
                            codebook_size=8, codebook_dim=4)
    codec = Codec(codec_cfg)
    codec_params = jax.jit(codec.init)(jax.random.PRNGKey(0),
                                       jnp.zeros((1, 640, 1)))
    hub_cfg = HubertConfig(
        conv_dim=(8,) * 7, conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_stride=(5, 2, 2, 2, 2, 2, 2), hidden_size=16,
        num_hidden_layers=1, num_attention_heads=4, intermediate_size=32,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    )
    sem = SemanticTokenizerHubert(hub_cfg)
    hub_params = jax.jit(HubertModel(hub_cfg).init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 1280))
    )
    sem_params = sem.make_params(hub_params, rng.standard_normal((8, 16)))
    tok = AudioTokenizer(codec, sem)

    out44 = tok.compute_codes_from_file(codec_params, sem_params, str(f44))
    out16 = tok.compute_codes_from_file(codec_params, sem_params, str(f16))

    s44 = np.asarray(out44["semantic_codes"])[0]
    s16 = np.asarray(out16["semantic_codes"])[0]
    a44 = np.asarray(out44["acoustic_codes"])[0]
    a16 = np.asarray(out16["acoustic_codes"])[0]
    n = min(s44.shape[-1], s16.shape[-1])
    sem_agree = float(np.mean(s44[:n] == s16[:n]))
    ac_agree = float(np.mean(a44[0, :n] == a16[0, :n]))
    assert sem_agree >= 0.9, f"semantic token agreement {sem_agree:.3f}"
    assert ac_agree >= 0.8, f"acoustic level-0 agreement {ac_agree:.3f}"
