"""Embedding lookup and cross-entropy gathers with MXU-friendly backwards.

XLA:TPU lowers the backward of a gather (``table[ids]``,
``take_along_axis``) to a scatter-add, which serializes on TPU and can
dominate a training step at LM batch sizes (B*T ~ 44k rows for the t2s
canvas). These wrappers keep the cheap gather in the forward pass but
define custom VJPs that express the backward as dense one-hot matmuls /
fused selects, which XLA tiles onto the MXU.

Used by the t2s/s2a training forwards (reference surfaces:
modeling_text_to_semantic.py:126-134 and modeling_injection_conformer.py
masked-CE; the reference relies on cuDNN embedding backwards instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.custom_vjp
def embed_take(table: Array, ids: Array) -> Array:
    """``table[ids]`` with a one-hot-matmul backward.

    table: ``(V, D)``; ids: int ``(...,)``. Returns ``(..., D)``.
    """
    return jnp.take(table, ids, axis=0)


def _embed_fwd(table, ids):
    # the table itself rides along only for its shape/dtype (residuals must
    # be JAX types); it is a live parameter, so this costs nothing
    return jnp.take(table, ids, axis=0), (ids, table)


def _embed_bwd(res, g):
    ids, table = res
    vocab, dtype = table.shape[0], table.dtype
    flat_ids = ids.reshape(-1)
    flat_g = g.reshape(-1, g.shape[-1])
    # dense (V, N) @ (N, D): MXU matmul instead of a serialized scatter-add
    onehot = jax.nn.one_hot(flat_ids, vocab, dtype=flat_g.dtype, axis=0)
    d_table = jax.lax.dot_general(
        onehot, flat_g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    return d_table, None


embed_take.defvjp(_embed_fwd, _embed_bwd)


def masked_cross_entropy(
    logits: Array, labels: Array, loss_mask: Array
) -> Array:
    """Mean CE over ``loss_mask`` positions, no gather/scatter anywhere.

    logits: ``(..., V)`` (any float dtype; statistics in f32);
    labels: int ``(...,)`` clipped into range by the caller;
    loss_mask: bool ``(...,)``.

    The picked-logit term is a fused select-reduce (one-hot compare), so the
    backward is ``softmax - one_hot`` — dense elementwise, no scatter.
    """
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    v = logits.shape[-1]
    onehot = (labels[..., None] == jnp.arange(v, dtype=labels.dtype)).astype(
        logits.dtype
    )
    picked = jnp.sum(logits * onehot, axis=-1)
    nll = lse - picked
    m = loss_mask.astype(jnp.float32)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1)
