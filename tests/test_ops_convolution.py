"""Parity tests for channel-last conv primitives vs torch CPU reference."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from edm_tts_tpu.ops import (
    conv1d,
    conv1d_output_length,
    conv_transpose1d,
    encoder_output_length,
    weight_norm,
)


def _to_torch_conv_weight(kernel):
    # ours (K, Cin, Cout) -> torch (Cout, Cin, K)
    return torch.from_numpy(np.transpose(kernel, (2, 1, 0)).copy())


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,dil",
    [
        (1, 8, 7, 1, 3, 1),
        (8, 8, 7, 1, 27, 9),
        (8, 16, 10, 5, 3, 1),
        (16, 16, 1, 1, 0, 1),
        (8, 16, 4, 2, 1, 1),
    ],
)
def test_conv1d_matches_torch(rng, cin, cout, k, stride, pad, dil):
    x = rng.standard_normal((2, 61, cin)).astype(np.float32)
    w = rng.standard_normal((k, cin, cout)).astype(np.float32)
    b = rng.standard_normal((cout,)).astype(np.float32)

    ours = conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                  stride=stride, padding=pad, dilation=dil)
    theirs = F.conv1d(
        torch.from_numpy(np.transpose(x, (0, 2, 1)).copy()),
        _to_torch_conv_weight(w),
        torch.from_numpy(b),
        stride=stride, padding=pad, dilation=dil,
    ).numpy().transpose(0, 2, 1)

    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4, rtol=1e-4)
    assert ours.shape[1] == conv1d_output_length(61, k, stride, pad, dil)


@pytest.mark.parametrize(
    "cin,cout,stride",
    [(16, 8, 8), (16, 8, 5), (16, 8, 4), (16, 8, 2)],
)
def test_conv_transpose1d_matches_torch(rng, cin, cout, stride):
    # DAC decoder parameterization: k=2*stride, pad=floor(s/2), outpad=s%2
    k, pad, outpad = 2 * stride, stride // 2, stride % 2
    x = rng.standard_normal((2, 17, cin)).astype(np.float32)
    w = rng.standard_normal((k, cin, cout)).astype(np.float32)
    b = rng.standard_normal((cout,)).astype(np.float32)

    ours = conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                            stride=stride, padding=pad, output_padding=outpad)
    # torch ConvTranspose1d weight layout: (Cin, Cout, K)
    theirs = F.conv_transpose1d(
        torch.from_numpy(np.transpose(x, (0, 2, 1)).copy()),
        torch.from_numpy(np.transpose(w, (1, 2, 0)).copy()),
        torch.from_numpy(b),
        stride=stride, padding=pad, output_padding=outpad,
    ).numpy().transpose(0, 2, 1)

    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4, rtol=1e-4)
    assert ours.shape[1] == (17 - 1) * stride - 2 * pad + k + outpad


@pytest.mark.parametrize("stride", [8, 5, 4, 2])
def test_conv_transpose_phase_reformulation(rng, stride):
    """conv_transpose1d_phases == conv_transpose1d for k=2s codec blocks."""
    from edm_tts_tpu.ops.convolution import conv_transpose1d_phases

    k, pad, outpad = 2 * stride, stride // 2, stride % 2
    x = jnp.asarray(rng.standard_normal((2, 17, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, 6, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(4).astype(np.float32))
    a = conv_transpose1d(x, w, b, stride=stride, padding=pad,
                         output_padding=outpad)
    c = conv_transpose1d_phases(x, w, b, stride=stride, padding=pad,
                                output_padding=outpad)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-4,
                               rtol=1e-4)


def test_weight_norm_matches_torch(rng):
    w = rng.standard_normal((7, 4, 8)).astype(np.float32)
    g = rng.standard_normal((8,)).astype(np.float32) ** 2 + 0.1
    ours = weight_norm(jnp.asarray(w), jnp.asarray(g))
    wt = _to_torch_conv_weight(w)  # (8, 4, 7)
    norm = wt.reshape(8, -1).norm(dim=1)
    theirs = wt * (torch.from_numpy(g) / norm)[:, None, None]
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(2, 1, 0), atol=1e-5, rtol=1e-5
    )


def test_encoder_output_length_is_hop_division():
    # The tokenizer pad hack (pad to hop multiple, then +hop/4=80 per side)
    # makes the DAC encoder emit exactly T/320 frames; HuBERT's conv stack
    # (downsample 320, receptive field 400) then emits the same count --
    # that is the reason for the hack (reference audio_tokenizer.py:34-39).
    strides = (2, 4, 5, 8)
    for t in [320, 640, 16000, 48000]:
        t_padded = t + 160  # +80 both sides
        assert encoder_output_length(t_padded, strides) == t // 320
        # HuBERT conv stack: (10,5), (3,2)x4, (2,2)x2, no padding
        h = t_padded
        for k, s in [(10, 5)] + [(3, 2)] * 4 + [(2, 2)] * 2:
            h = conv1d_output_length(h, k, s, 0)
        assert h == t // 320
