"""Conformer backbone shared by the t2s and s2a stages.

Block structure parity with the reference
(/root/reference/edm_tts/models/conformer/conformer.py:184-235):
``x + 0.5*FF(LN x)`` -> ``x + MHSA(LN x, RoPE)`` -> ``x + ConvModule(x)`` ->
``x + 0.5*FF(LN x)`` -> ``LN x``. The conv module is
LN -> pointwise (dim -> 2*2*dim) -> GLU -> depthwise k (same padding) ->
Swish -> scale-only channel LayerNorm -> pointwise (2*dim -> dim).

TPU-first choices: channel-last everywhere, RoPE applied outside the fused
attention kernel, depthwise conv as a grouped ``lax.conv`` (VPU-bound, XLA
fuses GLU/Swish around it), bf16 compute with f32 LayerNorm statistics.
Blocks support early exit (``output_layer_idx``, reference :293-294) and the
injection taps used by the s2a wrapper.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from edm_tts_tpu.ops import apply_rope, conv1d, mha, rope_frequencies
from edm_tts_tpu.ops.qdense import QDense

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    dim: int = 512
    depth: int = 8
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    conv_expansion_factor: int = 2
    conv_kernel_size: int = 31
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    conv_dropout: float = 0.0
    attn_implementation: str = "auto"
    # "none" | "int8": weight-only int8 matmuls (in-VMEM dequant Pallas
    # kernel, ops/qdense.py) for the memory-bound batch-1 sampler path.
    # Inference-only serving mode; params come from models/quantize.py.
    quantize: str = "none"
    remat: bool = False  # gradient checkpointing (reference conformer.py:220-230 hooks)
    # remat policy (ignored unless remat; see _remat_policy below):
    # "full" recomputes the whole block in the backward; "dots" saves matmul
    # outputs (much less recompute, ~8x the activation memory); "mha" saves
    # only the attention-kernel output (+BTHD bf16 per block ~ 50 MB at the
    # s2a shape) so the backward skips the single most expensive recompute.
    remat_policy: str = "dots"

    @classmethod
    def from_reference_args(cls, dim: int, args: dict) -> "ConformerConfig":
        """Build from a reference-style encoder args dict (depth/heads/...)."""
        return cls(
            dim=dim,
            depth=args.get("depth", 8),
            dim_head=args.get("dim_head", dim // args.get("heads", 8)),
            heads=args.get("heads", 8),
            ff_mult=args.get("ff_mult", 4),
            conv_kernel_size=args.get("conv_kernel_size", 31),
            attn_dropout=args.get("attn_dropout", 0.0),
            ff_dropout=args.get("ff_dropout", 0.0),
            conv_dropout=args.get("conv_dropout", 0.0),
        )


def _remat_policy(name: str):
    """Checkpoint policy for ``nn.remat`` over a conformer block.

    "dots": save matmul outputs + the named attention-kernel output
    ("mha_out", tagged in ops/attention.py — a Pallas custom call is not a
    jaxpr dot, so without the name it would be recomputed in the backward).
    Fastest backward, ~8x the activation memory of "full" (OOMs the 464M s2a
    at batch 32 x 768 on 16G).
    "mha": save only "mha_out". Nearly the memory profile of "full" but the
    backward never re-runs the attention kernel — the most expensive single
    recompute in the block.
    "full": save block inputs only (recompute everything).
    """
    if name == "dots":
        return jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            jax.checkpoint_policies.save_only_these_names("mha_out"),
        )
    if name == "mha":
        return jax.checkpoint_policies.save_only_these_names("mha_out")
    if name != "full":
        raise ValueError(f"unknown remat_policy: {name!r}")
    return None


def _linear_init():
    return nn.initializers.lecun_normal()


class FeedForward(nn.Module):
    dim: int
    mult: int
    dropout: float
    dtype: Any = jnp.float32
    quantize: str = "none"

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        # QDense with explicit nn.Dense auto-names keeps param paths
        # (Dense_0/Dense_1) checkpoint-identical to the original layers.
        x = QDense(self.dim * self.mult, dtype=self.dtype,
                   quantize=self.quantize, name="Dense_0")(x)
        x = x * jax.nn.sigmoid(x)  # Swish
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = QDense(self.dim, dtype=self.dtype, quantize=self.quantize,
                   name="Dense_1")(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class Attention(nn.Module):
    dim: int
    heads: int
    dim_head: int
    dropout: float
    implementation: str = "xla"
    dtype: Any = jnp.float32
    quantize: str = "none"

    @nn.compact
    def __call__(
        self,
        x: Array,
        *,
        rope: Array | None = None,
        mask: Array | None = None,
        train: bool = False,
        return_attn: bool = False,
    ) -> Array:
        b, t, _ = x.shape
        inner = self.heads * self.dim_head
        q = QDense(inner, use_bias=False, dtype=self.dtype,
                   quantize=self.quantize, name="to_q")(x)
        kv = QDense(2 * inner, use_bias=False, dtype=self.dtype,
                    quantize=self.quantize, name="to_kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(b, t, self.heads, self.dim_head)
        k = k.reshape(b, t, self.heads, self.dim_head)
        v = v.reshape(b, t, self.heads, self.dim_head)
        if rope is not None:
            # reference applies RoPE per-head on (b h n d); ours is (b n h d)
            q = apply_rope(rope[:, None, :], q)
            k = apply_rope(rope[:, None, :], k)
        attn = None
        if return_attn:
            # manual path returning the attention map (reference
            # attend.py:117-178 einsum fallback)
            sim = jnp.einsum("bihd,bjhd->bhij", q, k) * self.dim_head**-0.5
            if mask is not None:
                sim = jnp.where(mask[:, None, None, :], sim, -1e9)
            attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)
            out = jnp.einsum("bhij,bjhd->bihd", attn.astype(q.dtype), v)
        else:
            out = mha(q, k, v, mask=mask, implementation=self.implementation)
        out = out.reshape(b, t, inner)
        out = QDense(self.dim, dtype=self.dtype, quantize=self.quantize,
                     name="to_out")(out)
        return (out, attn) if return_attn else out


class ChanLayerNorm(nn.Module):
    """Scale-only LayerNorm over channels with biased variance (reference
    conformer.py:92-100); eps 1e-6 in f32 stats."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(jnp.maximum(var, 1e-6))
        return (y * w).astype(x.dtype)


class ConvModule(nn.Module):
    dim: int
    expansion_factor: int
    kernel_size: int
    dropout: float
    dtype: Any = jnp.float32
    quantize: str = "none"

    @nn.compact
    def __call__(
        self, x: Array, *, pad_mask: Array | None = None, train: bool = False
    ) -> Array:
        inner = self.dim * self.expansion_factor
        k = self.kernel_size
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = QDense(2 * inner, dtype=self.dtype, quantize=self.quantize,
                   name="pw_in")(x)
        gate, val = x[..., inner:], x[..., :inner]
        x = val * jax.nn.sigmoid(gate)  # GLU (torch chunks: first half = out)
        if pad_mask is not None:
            # zero invalid positions right before the only cross-position op:
            # the depthwise conv then sees exactly the zeros that "same"
            # padding would supply at a true sequence edge, making a padded
            # canvas bit-identical to an exact-size one at valid positions.
            # (Inference-only extension: the reference never masks the conv —
            # its inference canvases are always exact-size, batch 1.)
            x = jnp.where(pad_mask[:, :, None], x, 0)
        # depthwise conv, same padding: (k//2, k//2 - (k+1)%2)
        pad = (k // 2, k // 2 - (k + 1) % 2)
        dw = self.param(
            "dw_kernel", _linear_init(), (k, 1, inner)
        )
        dw_b = self.param("dw_bias", nn.initializers.zeros, (inner,))
        x = conv1d(
            x, dw.astype(self.dtype), dw_b.astype(self.dtype),
            padding=pad, groups=inner,
        )
        x = x * jax.nn.sigmoid(x)  # Swish
        x = ChanLayerNorm()(x)
        x = QDense(self.dim, dtype=self.dtype, quantize=self.quantize,
                   name="pw_out")(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class ConformerBlock(nn.Module):
    cfg: ConformerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        *,
        rope: Array | None = None,
        mask: Array | None = None,
        conv_pad_mask: Array | None = None,
        train: bool = False,
        return_attn: bool = False,
    ) -> Array:
        c = self.cfg
        x = x + 0.5 * FeedForward(c.dim, c.ff_mult, c.ff_dropout, self.dtype,
                                  quantize=c.quantize,
                                  name="ff1")(nn.LayerNorm(dtype=self.dtype)(x), train=train)
        attn_out = Attention(
            c.dim, c.heads, c.dim_head, c.attn_dropout,
            implementation=c.attn_implementation, dtype=self.dtype,
            quantize=c.quantize, name="attn",
        )(nn.LayerNorm(dtype=self.dtype)(x), rope=rope, mask=mask, train=train,
          return_attn=return_attn)
        attn_weights = None
        if return_attn:
            attn_out, attn_weights = attn_out
        x = x + attn_out
        x = x + ConvModule(
            c.dim, c.conv_expansion_factor, c.conv_kernel_size, c.conv_dropout,
            self.dtype, quantize=c.quantize, name="conv",
        )(x, pad_mask=conv_pad_mask, train=train)
        x = x + 0.5 * FeedForward(c.dim, c.ff_mult, c.ff_dropout, self.dtype,
                                  quantize=c.quantize,
                                  name="ff2")(nn.LayerNorm(dtype=self.dtype)(x), train=train)
        x = nn.LayerNorm(dtype=self.dtype, name="post_norm")(x)
        return (x, attn_weights) if return_attn else x


class Conformer(nn.Module):
    cfg: ConformerConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.blocks = [
            ConformerBlock(self.cfg, dtype=self.dtype, name=f"block_{i}")
            for i in range(self.cfg.depth)
        ]

    def __call__(
        self,
        x: Array,
        *,
        mask: Array | None = None,
        conv_pad_mask: Array | None = None,
        output_layer_idx: int | None = None,
        train: bool = False,
        return_attn: bool = False,
    ) -> Array:
        rope = rope_frequencies(x.shape[-2], self.cfg.dim_head)

        def apply_block(mdl, x, rope, mask, conv_pad_mask):
            return mdl(x, rope=rope, mask=mask, conv_pad_mask=conv_pad_mask,
                       train=train)

        if self.cfg.remat and train:
            apply_block = nn.remat(
                apply_block, policy=_remat_policy(self.cfg.remat_policy)
            )
        attns = [] if return_attn else None
        for i, block in enumerate(self.blocks):
            if return_attn:
                x, attn = block(x, rope=rope, mask=mask,
                                conv_pad_mask=conv_pad_mask, train=train,
                                return_attn=True)
                attns.append(attn)
            else:
                x = apply_block(block, x, rope, mask, conv_pad_mask)
            if output_layer_idx is not None and i == output_layer_idx:
                return (x, attns) if return_attn else x
        return (x, attns) if return_attn else x
