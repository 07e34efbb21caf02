"""Weight-only int8 dense layer for the memory-bound sampler path.

Why this exists: inside the fused batch-1 sampler scans the chip is AT the
HBM read roofline (~143 GB/s of weight streaming, benchmarks/README.md
"Batch-1 roofline reconciliation"), so the only remaining lever on batch-1
latency is *bytes* — int8 weights halve the stream. The round-2 crux test
rejected int8 because the XLA path materializes the dequantized bf16
weights back through HBM (bf16 1.21 ms vs int8 1.39-1.51 ms on a 12-layer
FF chain); this kernel dequantizes *in VMEM* instead: each (K, bn) int8
weight block is DMA'd once, converted to the activation dtype on the VPU
(a few us per MB, far under the DMA time), fed to the MXU, and the f32
accumulator is scaled per output channel on the way out. HBM sees int8
bytes only.

Quantization scheme: symmetric per-output-channel
``scale[n] = max_k |W[k, n]| / 127``, ``q = round(W / scale)`` — exact to
apply as an output-column scale after the matmul (no inner-loop rescaling).

The flax module ``QDense`` is parameter-compatible with ``nn.Dense`` when
``quantize == "none"`` (same ``kernel``/``bias`` names, shapes, dtype
promotion), so swapping it into the model stacks changes nothing for
training or existing checkpoints; ``quantize == "int8"`` declares
``kernel_q`` (int8) + ``kernel_scale`` (f32) instead, filled offline by
``models/quantize.py`` from a bf16/f32 checkpoint.

The reference has no quantization surface (torch bf16 autocast only,
/root/reference/inference.py:33); this is a beyond-reference serving
feature, default-off everywhere.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

# ---------------------------------------------------------------------------
# quantization


def quantize_weight(w: Array) -> tuple[Array, Array]:
    """``(K, N)`` float weights -> (int8 ``(K, N)``, f32 per-column scale
    ``(N,)``). Symmetric, round-to-nearest; zero columns get scale 1."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantizable_shape(in_features: int, features: int) -> bool:
    """Static predicate: can (in, out) run through the int8 kernel?
    K rides sublanes (int8 tile 32) and N rides lanes (128)."""
    return in_features % 32 == 0 and features % 128 == 0


# ---------------------------------------------------------------------------
# kernel


def _qdense_kernel(x_ref, w_ref, s_ref, o_ref):
    # int8 -> activation dtype inside VMEM; MXU dot with f32 accumulation;
    # per-output-channel scale on the (bm, bn) accumulator.
    w = w_ref[:].astype(x_ref.dtype)
    acc = jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (acc * s_ref[0][None, :]).astype(o_ref.dtype)


def _pick_block_n(k: int, n: int, bm: int, x_itemsize: int) -> int | None:
    """Largest lane block in {512, 256, 128} dividing N whose working set
    (resident x + double-buffered int8 w + converted w + f32 acc + out)
    stays under ~11 MB of VMEM; None if nothing fits."""
    for bn in (512, 256, 128):
        if n % bn:
            continue
        est = (
            bm * k * x_itemsize      # x block (revisited across the n grid)
            + 2 * k * bn             # int8 w, double buffered
            + k * bn * 2             # bf16 converted copy
            + bm * bn * 4            # f32 accumulator
            + 2 * bm * bn * x_itemsize  # out block, double buffered
        )
        if est <= 11_000_000:
            return bn
    return None


def _pick_block_m(m_pad: int) -> int:
    """Row block: whole M when small (batch-1 sampler: one fat block per
    weight column block), else 1k-row tiles (M is padded up to a multiple)."""
    return m_pad if m_pad <= 1024 else 1024


def int8_dense(
    x: Array,
    kernel_q: Array,
    kernel_scale: Array,
    *,
    implementation: str = "auto",
    interpret: bool = False,
) -> Array:
    """``x @ dequant(kernel_q)`` with in-VMEM dequantization.

    x: ``(..., K)`` (bf16/f32); kernel_q: ``(K, N)`` int8;
    kernel_scale: ``(N,)`` f32. Returns ``(..., N)`` in ``x.dtype``.

    implementation: "pallas" | "xla" | "w8a8" | "auto" (pallas on TPU when
    the shape is tile-aligned and a block layout fits VMEM; the XLA path —
    used on CPU and as fallback — dequantizes through HBM and is for
    correctness, not speed; "w8a8" additionally quantizes the activations
    per row and runs the MXU's native s8xs8->s32 dot — the only int8 form
    XLA executes without a dequant pass, fully fusable, at the cost of
    activation quantization error).
    """
    k, n = kernel_q.shape
    lead = x.shape[:-1]
    xf = x.reshape(-1, k)
    m = xf.shape[0]

    if implementation == "w8a8":
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        xscale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
        xq = jnp.clip(
            jnp.round(xf.astype(jnp.float32) / xscale), -127, 127
        ).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, kernel_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = (acc.astype(jnp.float32) * xscale * kernel_scale[None, :]).astype(
            x.dtype
        )
        return out.reshape(*lead, n)

    if implementation == "auto":
        on_tpu = jax.default_backend() == "tpu"
        implementation = "pallas" if on_tpu and quantizable_shape(k, n) else "xla"

    if implementation == "xla":
        acc = jax.lax.dot_general(
            xf, kernel_q.astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = (acc * kernel_scale[None, :]).astype(x.dtype)
        return out.reshape(*lead, n)

    sub = 8 if xf.dtype == jnp.float32 else 16
    m_pad = -(-m // sub) * sub
    bm = _pick_block_m(m_pad)
    m_pad = -(-m_pad // bm) * bm  # pad M up to a whole number of row blocks
    bn = _pick_block_n(k, n, bm, xf.dtype.itemsize)
    if bn is None:  # K too fat for any lane block: fall back
        return int8_dense(
            x, kernel_q, kernel_scale, implementation="xla"
        )
    if m_pad != m:
        xf = jnp.pad(xf, ((0, m_pad - m), (0, 0)))
    scale2d = kernel_scale.reshape(1, n)

    grid = (n // bn, m_pad // bm)  # m innermost: w block constant across it
    out = pl.pallas_call(
        _qdense_kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda j, i: (i, 0)),
            pl.BlockSpec((k, bn), lambda j, i: (0, j)),
            pl.BlockSpec((1, bn), lambda j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, i: (i, j)),
        interpret=interpret,
    )(xf, kernel_q, scale2d)
    if m_pad != m:
        out = out[:m]
    return out.reshape(*lead, n)


# ---------------------------------------------------------------------------
# w8a8 training forward (straight-through estimator)


def _w8a8_forward_math(x2d: Array, kernel: Array) -> Array:
    """Dynamic per-row x quant + per-column w quant + native s8xs8 dot.
    Same numerics as ``int8_dense(implementation="w8a8")`` except the weight
    is quantized on the fly (training updates it every step, so there is no
    offline int8 copy to stream)."""
    amax_x = jnp.max(jnp.abs(x2d), axis=-1, keepdims=True)
    xscale = jnp.where(amax_x > 0, amax_x / 127.0, 1.0).astype(jnp.float32)
    xq = jnp.clip(
        jnp.round(x2d.astype(jnp.float32) / xscale), -127, 127
    ).astype(jnp.int8)
    amax_w = jnp.max(jnp.abs(kernel), axis=0)
    wscale = jnp.where(amax_w > 0, amax_w / 127.0, 1.0).astype(jnp.float32)
    wq = jnp.clip(
        jnp.round(kernel.astype(jnp.float32) / wscale[None, :]), -127, 127
    ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * xscale * wscale[None, :]).astype(x2d.dtype)


@jax.custom_vjp
def w8a8_matmul_ste(x2d: Array, kernel: Array) -> Array:
    """``x @ w`` with a w8a8 quantized FORWARD and full-precision straight-
    through GRADIENTS (dx = g @ w.T, dw = x.T @ g on the unquantized
    operands) — the standard int8-training recipe. Exists for the t2s
    training-throughput crux (scripts/t2s_w8a8_train_crux.py); the MXU's
    s8 dot replaces the bf16 dot on the forward third of the step's
    matmuls only, because the backward must stay bf16 for convergence."""
    return _w8a8_forward_math(x2d, kernel)


def _w8a8_ste_fwd(x2d, kernel):
    return _w8a8_forward_math(x2d, kernel), (x2d, kernel)


def _w8a8_ste_bwd(res, g):
    x2d, kernel = res
    g = g.astype(kernel.dtype)
    dx = jax.lax.dot_general(g, kernel, (((1,), (1,)), ((), ())))
    dw = jax.lax.dot_general(
        x2d.astype(g.dtype), g, (((0,), (0,)), ((), ()))
    )
    return dx.astype(x2d.dtype), dw.astype(kernel.dtype)


w8a8_matmul_ste.defvjp(_w8a8_ste_fwd, _w8a8_ste_bwd)


# ---------------------------------------------------------------------------
# flax module


class QDense(nn.Module):
    """Drop-in ``nn.Dense`` with an optional weight-only int8 mode.

    ``quantize == "none"``: identical parameters (``kernel``/``bias``) and
    numerics to ``nn.Dense`` (dtype promotion included) — safe swap in
    existing models/checkpoints.

    ``quantize == "int8"`` (weight-only, in-VMEM Pallas dequant) and
    ``quantize == "w8a8"`` (dynamic per-row activation quant + native
    s8xs8 MXU dot): both declare ``kernel_q`` int8 + ``kernel_scale`` f32
    (filled by ``models/quantize.py`` — same checkpoint format for both
    modes) and dispatch to ``int8_dense``. Shapes the int8 kernel cannot
    tile (K % 32 or N % 128 != 0) keep the float kernel even in quantized
    modes, so the decision is static and the converter (which walks the
    abstract param tree) always agrees with it.

    ``quantize == "w8a8_train"``: TRAINING variant — ordinary float
    ``kernel`` param (trainable, checkpoint-identical to "none"), w8a8
    forward with on-the-fly weight quantization, straight-through bf16
    gradients (``w8a8_matmul_ste``). Same shape gate as the other modes.
    """

    features: int
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32
    quantize: str = "none"
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        if self.quantize not in ("none", "int8", "w8a8", "w8a8_train"):
            raise ValueError(f"unknown quantize mode: {self.quantize!r}")
        quantized = self.quantize != "none" and quantizable_shape(
            in_features, self.features
        )

        bias = (
            self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        if not quantized or self.quantize == "w8a8_train":
            # "w8a8_train" keeps the ordinary float `kernel` param (the
            # optimizer updates it; checkpoints stay format-identical to
            # quantize="none") and swaps only the forward matmul for the
            # quantized STE form.
            kernel = self.param(
                "kernel", self.kernel_init, (in_features, self.features),
                self.param_dtype,
            )
            x, kernel, bias = nn.dtypes.promote_dtype(
                x, kernel, bias, dtype=self.dtype
            )
            if quantized:
                lead = x.shape[:-1]
                y = w8a8_matmul_ste(
                    x.reshape(-1, in_features), kernel
                ).reshape(*lead, self.features)
            else:
                y = jax.lax.dot_general(
                    x, kernel, (((x.ndim - 1,), (0,)), ((), ()))
                )
        else:
            kernel_q = self.param(
                "kernel_q",
                nn.initializers.zeros,
                (in_features, self.features),
                jnp.int8,
            )
            kernel_scale = self.param(
                "kernel_scale",
                nn.initializers.ones,
                (self.features,),
                jnp.float32,
            )
            x, bias = nn.dtypes.promote_dtype(x, bias, dtype=self.dtype)
            impl = "w8a8" if self.quantize == "w8a8" else "auto"
            y = int8_dense(x, kernel_q, kernel_scale, implementation=impl)
        if bias is not None:
            y = y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
        return y
