"""Weight-normalized conv layers and residual units for the neural codec.

TPU-native re-design of the reference DAC primitives
(/root/reference/edm_tts/models/dac/nn_layers.py): channel-last activations,
``(K, C_in, C_out)`` kernels, weight-norm as an explicit reparameterization
(direction ``v`` + per-output-channel magnitude ``g``) fused by XLA into the
conv operand, and the Snake activation expressed directly in jnp so it fuses
into the conv epilogue.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from edm_tts_tpu.ops import conv1d, conv_transpose1d, snake, weight_norm

Array = jax.Array


def _fan_in_uniform(fan_in: int):
    """torch conv default init: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def _g_from_v(v: Array) -> Array:
    axes = tuple(range(v.ndim - 1))
    return jnp.sqrt(jnp.sum(jnp.square(v), axis=axes))


class WNConv1d(nn.Module):
    """Weight-normalized 1D conv, channel-last. ``g`` is initialized to
    ``||v||`` so the initial effective kernel equals ``v`` (torch parity)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        fan_in = (in_features // self.groups) * self.kernel_size
        v = self.param(
            "v",
            _fan_in_uniform(fan_in),
            (self.kernel_size, in_features // self.groups, self.features),
        )
        g = self.param("g", lambda key, _: _g_from_v(v), None)
        kernel = weight_norm(v, g).astype(self.dtype)
        bias = None
        if self.use_bias:
            bias = self.param(
                "b", _fan_in_uniform(fan_in), (self.features,)
            ).astype(self.dtype)
        return conv1d(
            x.astype(self.dtype),
            kernel,
            bias,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
        )


class WNConvTranspose1d(nn.Module):
    """Weight-normalized transposed 1D conv with torch length semantics."""

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, return_folded: bool = False):
        in_features = x.shape[-1]
        # torch ConvTranspose fan_in = C_out * K (weight dim 1 x receptive field)
        fan_in = self.features * self.kernel_size
        v = self.param(
            "v",
            _fan_in_uniform(fan_in),
            (self.kernel_size, in_features, self.features),
        )
        # torch weight_norm(dim=0) on (C_in, C_out, K): norm over (out, k) per
        # *input* channel -> in our (K, C_in, C_out) layout that is axes (0, 2).
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 2), keepdims=True))
        g = self.param(
            "g", lambda key, _: jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 2))), None
        )
        kernel = (v * (g[None, :, None] / norm)).astype(self.dtype)
        bias = None
        if self.use_bias:
            bias = self.param(
                "b", _fan_in_uniform(fan_in), (self.features,)
            ).astype(self.dtype)
        if return_folded:
            # same params/declaration order, no compute: the fused
            # DecoderBlock kernel consumes the folded weights directly
            return kernel, bias
        # note: a k=3 phase reformulation (ops.conv_transpose1d_phases) was
        # measured SLOWER here — the (T, s*C) -> (T*s, C) reshape is a
        # lane->sublane relayout that costs a full copy at audio rate; XLA's
        # lhs-dilated lowering wins on TPU for these shapes
        return conv_transpose1d(
            x.astype(self.dtype),
            kernel,
            bias,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
        )


class Snake(nn.Module):
    """Trainable per-channel Snake activation (alpha initialized to 1)."""

    @nn.compact
    def __call__(self, x: Array, return_alpha: bool = False):
        alpha = self.param("alpha", nn.initializers.ones, (x.shape[-1],))
        if return_alpha:
            return alpha
        return snake(x, alpha.astype(x.dtype))


class ResidualUnit(nn.Module):
    """Snake -> dilated k=7 WNConv -> Snake -> k=1 WNConv, with residual.

    Owns its parameters directly (same math as composing Snake/WNConv1d) so
    the fused Pallas path (ops/pallas_resunit.py — single-pass VMEM-resident
    kernel, the decoder RTF hot path) and the plain XLA composition share one
    checkpoint layout. ``use_pallas='auto'`` picks the kernel on TPU for
    k=7 units with MXU-friendly channel counts.
    """

    dim: int
    dilation: int = 1
    kernel_size: int = 7
    dtype: Any = jnp.float32
    use_pallas: str | bool = "auto"

    @nn.compact
    def __call__(self, x: Array, return_folded: bool = False):
        c = self.dim
        k = self.kernel_size
        alpha1 = self.param("alpha1", nn.initializers.ones, (c,))
        v7 = self.param("conv7_v", _fan_in_uniform(c * k), (k, c, c))
        g7 = self.param("conv7_g", lambda key, _: _g_from_v(v7), None)
        b7 = self.param("conv7_b", _fan_in_uniform(c * k), (c,))
        alpha2 = self.param("alpha2", nn.initializers.ones, (c,))
        v1 = self.param("conv1_v", _fan_in_uniform(c), (1, c, c))
        g1 = self.param("conv1_g", lambda key, _: _g_from_v(v1), None)
        b1 = self.param("conv1_b", _fan_in_uniform(c), (c,))

        w7 = weight_norm(v7, g7)
        w1 = weight_norm(v1, g1)

        if return_folded:
            return alpha1, w7, b7, alpha2, w1, b1

        use_pallas = self.use_pallas
        if use_pallas == "auto":
            # bf16 only: it's the serving dtype, and f32 weights at C=768
            # (7*768*768*4B = 16.5 MB) blow the 16 MB VMEM budget; training
            # (f32) keeps the exact unfused composition anyway
            use_pallas = (
                jax.default_backend() == "tpu"
                and k == 7
                and c <= 768
                and x.dtype == jnp.bfloat16
            )
        if use_pallas:
            from edm_tts_tpu.ops.pallas_resunit import fused_residual_unit

            return fused_residual_unit(
                x, alpha1, w7, b7, alpha2, w1, b1, self.dilation
            )

        pad = ((k - 1) * self.dilation) // 2
        y = snake(x, alpha1.astype(x.dtype))
        y = conv1d(
            y, w7.astype(self.dtype), b7.astype(self.dtype),
            padding=pad, dilation=self.dilation,
        )
        y = snake(y, alpha2.astype(y.dtype))
        y = conv1d(y, w1.astype(self.dtype), b1.astype(self.dtype))
        return x + y
