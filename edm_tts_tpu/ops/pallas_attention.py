"""Pallas TPU attention kernel (bidirectional, key-padding mask).

The Conformer stacks run full bidirectional attention over short sequences
(<= ~2.5k: 768-frame s2a crops, <=1250+text t2s canvases — SURVEY.md §5), so
the kernel keeps the whole K/V row set for one (batch, head) in VMEM
(2.5k x 64 x 4B = 640 KB per operand) and tiles queries in MXU-sized blocks:
one `q_blk @ K^T` contraction, masked f32 row softmax, one `p @ V`
contraction per grid step — numerically exact (no online-softmax error
accumulation), no HBM traffic for the score matrix, and fused mask/softmax
epilogue. A `sequence`-axis flash variant (online softmax over KV blocks)
only pays off for much longer canvases; revisit if the mask-canvas grows.

Layout contract matches ``ops.attention.mha``: q/k/v ``(B, T, H, D)``,
optional bool key-padding mask ``(B, T_k)`` (True = attend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (bq, d)
    k = k_ref[0].astype(jnp.float32)  # (T, d)
    v = v_ref[0].astype(jnp.float32)  # (T, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, T)
    if mask_ref is not None:
        valid = mask_ref[0, 0]  # (T,) bool
        s = jnp.where(valid[None, :], s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / denom
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_mha(
    q: Array,
    k: Array,
    v: Array,
    *,
    mask: Array | None = None,
    block_q: int = 256,
    interpret: bool = False,
) -> Array:
    """Pallas attention. q/k/v: ``(B, T, H, D)``; mask: bool ``(B, T_k)``."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    scale = d**-0.5

    # (B*H, T, D) layout: heads become grid rows, D stays on lanes
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, tq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, tk, d)

    block_q = min(block_q, tq)
    pad_q = (-tq) % block_q
    if pad_q:
        qf = jnp.pad(qf, ((0, 0), (0, pad_q), (0, 0)))
    tq_p = tq + pad_q
    grid = (b * h, tq_p // block_q)

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0)),
    ]
    args = [qf, kf, vf]
    if mask is not None:
        # (B, 1, Tk): the singleton dim keeps the last-two-dims block shape
        # aligned ((1, tk) == the array dims) for Mosaic
        in_specs.append(
            pl.BlockSpec((1, 1, tk), lambda i, j, h=h: (i // h, 0, 0))
        )
        args.append(mask[:, None, :])
        kernel = functools.partial(_attn_kernel, scale=scale)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, orf, **kw: _attn_kernel(qr, kr, vr, None, orf, **kw),
            scale=scale,
        )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(*args)

    out = out[:, :tq].reshape(b, h, tq, d).transpose(0, 2, 1, 3)
    return out


# -- differentiable wrapper --------------------------------------------------
# The Pallas forward is paired with an XLA backward (standard softmax-attention
# gradient): measured 1.65-1.8x forward speedup over XLA fused attention at
# the training shapes (B32xT768, B16xT1344) on v5e; a Pallas backward kernel
# is a future optimization.


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_mha_diff(q, k, v, mask, block_q: int = 256):
    return flash_mha(q, k, v, mask=mask, block_q=block_q)


def _fwd(q, k, v, mask, block_q):
    return flash_mha(q, k, v, mask=mask, block_q=block_q), (q, k, v, mask)


def _bwd(block_q, res, g):
    q, k, v, mask = res
    d = q.shape[-1]
    scale = d**-0.5
    s = jnp.einsum("bihd,bjhd->bhij", q, k).astype(jnp.float32) * scale
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bhij,bihd->bjhd", p, g32)
    dp = jnp.einsum("bihd,bjhd->bhij", g32, v32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhij,bjhd->bihd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhij,bihd->bjhd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


flash_mha_diff.defvjp(_fwd, _bwd)
