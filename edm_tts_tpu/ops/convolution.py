"""Channel-last 1D convolution primitives for TPU.

TPU-first conventions used throughout the framework:

- activations are channel-last ``(B, T, C)`` so the channel dim lands on the
  128-wide lane dimension of the VPU/MXU;
- kernels are ``(K, C_in, C_out)`` (``HIO``), which XLA tiles directly onto
  the MXU without transposition;
- all padding arithmetic matches the torch ``nn.Conv1d`` /
  ``nn.ConvTranspose1d`` semantics used by the reference codec
  (reference: /root/reference/edm_tts/models/dac/nn_layers.py) so token/frame
  alignment is bit-identical.

Weight normalization is a pure reparameterization here: parameters are stored
as a direction tensor ``v`` plus a per-output-channel magnitude ``g`` and the
effective kernel ``g * v / ||v||`` is materialized at call time (cheap; XLA
fuses the normalization into the conv's operand producer).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def weight_norm(v: Array, g: Array, *, eps: float = 0.0) -> Array:
    """``g * v / ||v||`` with the norm taken over all dims except the last.

    ``v`` has shape ``(..., C_out)`` and ``g`` has shape ``(C_out,)``, matching
    torch's ``weight_norm(dim=0)`` on an ``(C_out, C_in, K)`` kernel after our
    ``(K, C_in, C_out)`` re-layout.
    """
    axes = tuple(range(v.ndim - 1))
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True) + eps)
    return v * (g / norm)


def conv1d(
    x: Array,
    kernel: Array,
    bias: Array | None = None,
    *,
    stride: int = 1,
    padding: int | tuple[int, int] = 0,
    dilation: int = 1,
    groups: int = 1,
    precision=None,
) -> Array:
    """1D convolution, channel-last.

    Args:
      x: ``(B, T, C_in)``.
      kernel: ``(K, C_in // groups, C_out)``.
      padding: symmetric pad count, or explicit ``(left, right)``.

    Returns ``(B, T_out, C_out)`` with torch ``Conv1d`` length semantics.
    """
    if isinstance(padding, int):
        padding = (padding, padding)
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=(padding,),
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
        precision=precision,
    )
    if bias is not None:
        y = y + bias
    return y


def conv_transpose1d(
    x: Array,
    kernel: Array,
    bias: Array | None = None,
    *,
    stride: int,
    padding: int = 0,
    output_padding: int = 0,
    precision=None,
) -> Array:
    """Transposed 1D convolution matching torch ``ConvTranspose1d``.

    Args:
      x: ``(B, T, C_in)``.
      kernel: ``(K, C_in, C_out)`` — note: laid out like a forward conv; we
        flip the tap axis internally, so a torch ``ConvTranspose1d`` weight
        ``(C_in, C_out, K)`` maps to ``kernel[k, i, o] = w_torch[i, o, k]``.

    Output length: ``(T - 1) * stride - 2 * padding + K + output_padding``.
    """
    k = kernel.shape[0]
    flipped = jnp.flip(kernel, axis=0)
    pad_lo = k - 1 - padding
    pad_hi = k - 1 - padding + output_padding
    y = lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1,),
        padding=((pad_lo, pad_hi),),
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=precision,
    )
    if bias is not None:
        y = y + bias
    return y


def conv_transpose1d_phases(
    x: Array,
    kernel: Array,
    bias: Array | None = None,
    *,
    stride: int,
    padding: int = 0,
    output_padding: int = 0,
    precision=None,
) -> Array:
    """Transposed conv (k == 2*stride) as a dense k=3 phase convolution.

    Mathematically identical to ``conv_transpose1d`` for the codec's
    parameterization (k=2s, p=floor(s/2), op=s%2) but much faster on TPU:
    instead of an lhs-dilated conv (which XLA:TPU lowers poorly at audio
    rate), each output phase r of ``out[s*q + r]`` is a 2-tap combination of
    neighboring input frames, so the whole op becomes ONE k=3 conv with a
    wide (s*C_out) output — a big MXU matmul — followed by a free reshape.

    Derivation: ``out[s q + r] = x[q + m] . K[r + p - s m]`` summed over the
    m in {-1, 0, +1} with a valid tap index.
    """
    k, cin, cout = kernel.shape
    s = stride
    if k != 2 * s:
        return conv_transpose1d(
            x, kernel, bias, stride=stride, padding=padding,
            output_padding=output_padding, precision=precision,
        )
    p = padding
    b, t, _ = x.shape

    # build the 3-tap phase weights (static, folded by XLA at compile time)
    w3 = jnp.zeros((3, cin, s, cout), kernel.dtype)
    for r in range(s):
        if r < s - p:
            w3 = w3.at[0, :, r].set(kernel[s + r + p])  # x[q-1]
            w3 = w3.at[1, :, r].set(kernel[r + p])      # x[q]
        else:
            w3 = w3.at[1, :, r].set(kernel[r + p])      # x[q]
            w3 = w3.at[2, :, r].set(kernel[r + p - s])  # x[q+1]
    w3 = w3.reshape(3, cin, s * cout)

    y = conv1d(x, w3, padding=(1, 2), precision=precision)  # (B, T+1, s*Cout)
    y = y.reshape(b, (t + 1) * s, cout)
    true_len = (t - 1) * s - 2 * p + k + output_padding
    y = y[:, :true_len]
    if bias is not None:
        y = y + bias
    return y


def conv1d_output_length(
    length,
    kernel_size: int,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
):
    """torch ``Conv1d`` output length: floor((T + 2p - d(k-1) - 1)/s + 1).

    Reference parity: audio_tokenizer.py:9-10 (`compute_output_lengths`).
    Works on ints and integer arrays.
    """
    return (length + 2 * padding - dilation * (kernel_size - 1) - 1) // stride + 1


def encoder_output_length(length, strides: Sequence[int]):
    """Output length of the DAC encoder conv stack for a given input length.

    Mirrors AudioTokenizer.get_code_lengths (reference audio_tokenizer.py:80-89),
    which walks every Conv1d in the encoder. The dilated k=7 residual convs and
    k=1 convs are all exactly length-preserving, so only the strided downsample
    convs (k=2s, pad=ceil(s/2)) change the length; the final k=3 pad=1 and the
    k=7 pad=3 stem convs are also length-preserving.
    """
    out = length
    for s in strides:
        out = conv1d_output_length(out, 2 * s, stride=s, padding=math.ceil(s / 2))
    return out
