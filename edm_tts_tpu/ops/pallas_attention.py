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

The key-padding mask enters the kernels as an f32 *additive bias* (0 for
valid keys, -1e30 for padded ones), not as a bool ``where``: a vector
bool select over the (block_q, T_k) score matrix measured ~2x the whole
kernel's cost at the t2s training shape (B32 T1408 h16 d24: 17-18 ms
bool-where vs 9 ms additive, bit-identical outputs) — the i8 mask load +
vmask materialization dominates, while a broadcast f32 add fuses into the
score epilogue for free. exp(s - 1e30 - lse) underflows to exactly 0, so
masked keys contribute nothing, same as the where().
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
MASK_BIAS = -1e30  # additive key-padding bias; exp(s + MASK_BIAS - m) == 0.0


def _key_bias_lane(mask: Array) -> Array:
    """Bool (B, Tk) key mask -> f32 (B, 1, Tk) additive bias, lane layout."""
    return ((1.0 - mask.astype(jnp.float32)) * MASK_BIAS)[:, None, :]


def _auto_block(t: int, other: int, budget_bytes: int = 6_500_000) -> int:
    """Largest tile of the ``t`` axis whose f32 (block, other) score matrix
    stays under ``budget_bytes`` of VMEM, rounded to a sublane multiple.
    Fewer, fatter grid steps pipeline better (measured: bq 704 beats 256 by
    ~5% at T=1408; one one-shot block wins when it fits)."""
    n_blocks = max(1, -(-(t * other * 4) // budget_bytes))
    return min(t, -(-(-(-t // n_blocks)) // 64) * 64)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, scale: float):
    # keep matmul operands in the input dtype (bf16 in training): the MXU
    # runs bf16 MACs at full rate while f32 operands decompose into multiple
    # passes. Accumulation stays f32 via preferred_element_type.
    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (T, d)
    v = v_ref[0]  # (T, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, T) f32
    if bias_ref is not None:
        s = s + bias_ref[0, 0][None, :]  # (T,) f32 additive key bias
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / denom
    o_ref[0] = o.astype(o_ref.dtype)
    if lse_ref is not None:
        # (bq, 1) sublane layout — the natural orientation of the row stats;
        # the backward transposes it to lane layout once, in XLA.
        lse_ref[0] = m + jnp.log(denom)


@functools.partial(
    jax.jit, static_argnames=("block_q", "interpret", "return_lse")
)
def flash_mha(
    q: Array,
    k: Array,
    v: Array,
    *,
    mask: Array | None = None,
    block_q: int | None = None,
    interpret: bool = False,
    return_lse: bool = False,
) -> Array | tuple[Array, Array]:
    """Pallas attention. q/k/v: ``(B, T, H, D)``; mask: bool ``(B, T_k)``.

    With ``return_lse`` also returns the per-query-row logsumexp of the
    masked, scaled scores, shaped ``(B*H, T_q, 1)`` f32 — the softmax
    statistic the backward kernels need to recompute probabilities without
    materializing the score matrix."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    scale = d**-0.5

    # (B*H, T, D) layout: heads become grid rows, D stays on lanes
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, tq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, tk, d)

    if block_q is None:
        block_q = _auto_block(tq, tk)
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
    has_mask = mask is not None
    if has_mask:
        # (B, 1, Tk) f32 additive bias: the singleton dim keeps the
        # last-two-dims block shape aligned ((1, tk) == the array dims)
        in_specs.append(
            pl.BlockSpec((1, 1, tk), lambda i, j, h=h: (i // h, 0, 0))
        )
        args.append(_key_bias_lane(mask))

    def kernel(*refs):
        idx = 3 + int(has_mask)
        mask_ref = refs[3] if has_mask else None
        o_ref = refs[idx]
        lse_ref = refs[idx + 1] if return_lse else None
        _attn_kernel(
            refs[0], refs[1], refs[2], mask_ref, o_ref, lse_ref, scale=scale
        )

    out_shape = [jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0))]
    if return_lse:
        out_shape.append(jax.ShapeDtypeStruct((b * h, tq_p, 1), jnp.float32))
        out_specs.append(pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0)))

    res = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*args)

    out = res[0][:, :tq].reshape(b, h, tq, d).transpose(0, 2, 1, 3)
    if return_lse:
        return out, res[1][:, :tq]
    return out


# -- backward kernels ----------------------------------------------------------
# Same residency philosophy as the forward: per-(batch, head) grid row the
# full K/V (dq kernel) or Q/dO (dkv kernel) row set lives in VMEM and the
# other operand is tiled, so the (T_q, T_k) score/probability matrices exist
# only as per-block VMEM temporaries — never in HBM. The dq kernel recomputes
# the softmax exactly as the forward did (it has the full K row set); the
# dk/dv kernel reconstructs probabilities from the forward's LSE statistic
# (p = exp(s - lse), exact, no online-softmax drift). Replaces the round-1
# XLA backward that materialized (B, H, T, T) f32 einsums (~1.2 GB of HBM
# traffic per backward at the s2a training shape B32xH16xT768).


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, bias_ref, dq_ref, *, scale):
    # bf16 matmul operands, f32 accumulation/statistics (see _attn_kernel)
    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (Tk, d)
    v = v_ref[0]  # (Tk, d)
    do = do_ref[0]  # (bq, d)
    o = o_ref[0]  # (bq, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, Tk)
    if bias_ref is not None:
        s = s + bias_ref[0, 0][None, :]  # (Tk,) f32 additive key bias
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (bq, Tk) f32
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, Tk) f32
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )  # (bq, 1)
    ds = (p * (dp - delta) * scale).astype(k.dtype)
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)


def _dkv_kernel(
    k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref, biask_ref, dk_ref, dv_ref,
    *, scale,
):
    # bf16 matmul operands, f32 accumulation/statistics (see _attn_kernel)
    kb = k_ref[0]  # (bk, d)
    vb = v_ref[0]  # (bk, d)
    q = q_ref[0]  # (Tq, d)
    do = do_ref[0]  # (Tq, d)
    lse = lse_ref[0]  # (1, Tq) f32, lane layout
    delta = delta_ref[0]  # (1, Tq) f32
    st = jax.lax.dot_general(
        kb, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bk, Tq)
    if biask_ref is not None:
        st = st + biask_ref[0]  # (bk, 1) f32 additive key bias, sublane layout
    pt = jnp.exp(st - lse)  # (bk, Tq) f32; invalid keys -> exactly 0
    dv_ref[0] = jax.lax.dot_general(
        pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)  # (bk, d)
    dpt = jax.lax.dot_general(
        vb, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bk, Tq)
    dst = (pt * (dpt - delta) * scale).astype(q.dtype)
    dk_ref[0] = jax.lax.dot_general(
        dst, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_mha_bwd(
    q: Array,
    k: Array,
    v: Array,
    mask: Array | None,
    o: Array,
    lse: Array,
    g: Array,
    *,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
) -> tuple[Array, Array, Array]:
    """Pallas attention backward: (dq, dk, dv).

    q/k/v/o/g: ``(B, T, H, D)``; mask: bool ``(B, T_k)`` or None;
    lse: ``(B*H, T_q, 1)`` f32 from ``flash_mha(..., return_lse=True)``."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    scale = d**-0.5

    qf = q.transpose(0, 2, 1, 3).reshape(b * h, tq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    of = o.transpose(0, 2, 1, 3).reshape(b * h, tq, d)
    gf = g.transpose(0, 2, 1, 3).reshape(b * h, tq, d)

    if block_q is None:
        block_q = _auto_block(tq, tk)
    if block_k is None:
        block_k = _auto_block(tk, tq)
    block_q = min(block_q, tq)
    block_k = min(block_k, tk)
    pad_q = (-tq) % block_q
    pad_k = (-tk) % block_k
    tq_p, tk_p = tq + pad_q, tk + pad_k

    # -- dq: queries tiled, K/V resident ------------------------------------
    qf_p = jnp.pad(qf, ((0, 0), (0, pad_q), (0, 0))) if pad_q else qf
    gf_p = jnp.pad(gf, ((0, 0), (0, pad_q), (0, 0))) if pad_q else gf
    of_p = jnp.pad(of, ((0, 0), (0, pad_q), (0, 0))) if pad_q else of

    dq_specs = [
        pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),  # q
        pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0)),  # k
        pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0)),  # v
        pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),  # do
        pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),  # o
    ]
    dq_args = [qf_p, kf, vf, gf_p, of_p]
    has_mask = mask is not None
    if has_mask:
        dq_specs.append(
            pl.BlockSpec((1, 1, tk), lambda i, j, h=h: (i // h, 0, 0))
        )
        dq_args.append(_key_bias_lane(mask))

    def dq_kernel(*refs):
        mask_ref = refs[5] if has_mask else None
        _dq_kernel(
            refs[0], refs[1], refs[2], refs[3], refs[4], mask_ref, refs[-1],
            scale=scale,
        )

    dq = pl.pallas_call(
        dq_kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype),
        grid=(b * h, tq_p // block_q),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(*dq_args)[:, :tq]

    # -- dk/dv: keys tiled, Q/dO resident ------------------------------------
    kf_p = jnp.pad(kf, ((0, 0), (0, pad_k), (0, 0))) if pad_k else kf
    vf_p = jnp.pad(vf, ((0, 0), (0, pad_k), (0, 0))) if pad_k else vf
    # row stats to lane layout (one tiny XLA transpose); zero-pad the padded
    # query columns — their dO rows are zero so they contribute nothing.
    lse_lane = jnp.pad(
        lse[..., 0], ((0, 0), (0, pad_q))
    )[:, None, :]  # (B*H, 1, Tq_p)
    delta = jnp.sum(gf_p.astype(jnp.float32) * of_p.astype(jnp.float32), -1)
    delta_lane = delta[:, None, :]  # (B*H, 1, Tq_p)

    dkv_specs = [
        pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),  # k
        pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),  # v
        pl.BlockSpec((1, tq_p, d), lambda i, j: (i, 0, 0)),  # q
        pl.BlockSpec((1, tq_p, d), lambda i, j: (i, 0, 0)),  # do
        pl.BlockSpec((1, 1, tq_p), lambda i, j: (i, 0, 0)),  # lse
        pl.BlockSpec((1, 1, tq_p), lambda i, j: (i, 0, 0)),  # delta
    ]
    dkv_args = [kf_p, vf_p, qf_p, gf_p, lse_lane, delta_lane]
    if has_mask:
        # key bias in sublane layout (B, Tk_p, 1) so it predicates rows
        biask = jnp.pad(
            (1.0 - mask.astype(jnp.float32)) * MASK_BIAS,
            ((0, 0), (0, pad_k)),
            constant_values=MASK_BIAS,
        )[:, :, None]
        dkv_specs.append(
            pl.BlockSpec((1, block_k, 1), lambda i, j, h=h: (i // h, j, 0))
        )
        dkv_args.append(biask)

    def dkv_kernel(*refs):
        maskk_ref = refs[6] if has_mask else None
        _dkv_kernel(
            refs[0], refs[1], refs[2], refs[3], refs[4], refs[5], maskk_ref,
            refs[-2], refs[-1], scale=scale,
        )

    dk, dv = pl.pallas_call(
        dkv_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b * h, tk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, tk_p, d), v.dtype),
        ],
        grid=(b * h, tk_p // block_k),
        in_specs=dkv_specs,
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),
        ],
        interpret=interpret,
    )(*dkv_args)

    dq = dq.reshape(b, h, tq, d).transpose(0, 2, 1, 3)
    dk = dk[:, :tk].reshape(b, h, tk, d).transpose(0, 2, 1, 3)
    dv = dv[:, :tk].reshape(b, h, tk, d).transpose(0, 2, 1, 3)
    return dq, dk, dv


# -- differentiable wrapper --------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_mha_diff(q, k, v, mask, block_q: int | None = None, interpret: bool = False):
    return flash_mha(q, k, v, mask=mask, block_q=block_q, interpret=interpret)


def _fwd(q, k, v, mask, block_q, interpret):
    o, lse = flash_mha(
        q, k, v, mask=mask, block_q=block_q, interpret=interpret,
        return_lse=True,
    )
    return o, (q, k, v, mask, o, lse)


def _bwd(block_q, interpret, res, g):
    q, k, v, mask, o, lse = res
    dq, dk, dv = flash_mha_bwd(
        q, k, v, mask, o, lse, g, block_q=block_q, interpret=interpret
    )
    return dq, dk, dv, None


flash_mha_diff.defvjp(_fwd, _bwd)
