"""Multi-head attention kernels.

Replaces the reference's torch SDPA wrapper
(/root/reference/edm_tts/models/conformer/attend.py). Sequences in this
system are short (<= ~2.5k tokens), so the default path is
``jax.nn.dot_product_attention`` — XLA:TPU fuses the softmax chain and tiles
the two matmuls onto the MXU. A Pallas flash-attention kernel (block-wise
online softmax, VMEM-resident tiles) lives in ``ops/pallas_attention.py`` and
can be selected with ``implementation='pallas'`` for long-canvas decoding.

Layout: ``(B, T, H, D)`` (batch, time, heads, head_dim), channel-last.
Key-padding mask is a bool ``(B, T_k)`` (True = attend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

Array = jax.Array

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def mha(
    q: Array,
    k: Array,
    v: Array,
    *,
    mask: Array | None = None,
    implementation: str = "auto",
) -> Array:
    """Bidirectional multi-head attention.

    Args:
      q, k, v: ``(B, T, H, D)``.
      mask: optional bool ``(B, T_k)`` key-padding mask, True = valid.
      implementation: 'auto' (pallas on TPU, xla elsewhere), 'xla', 'pallas',
        or 'ring' (sequence-parallel over the ambient mesh's ``sequence``
        axis — trace the program under ``with mesh:``; see
        ops/ring_attention.py).
    Returns ``(B, T_q, H, D)``.
    """
    if implementation == "ring":
        from edm_tts_tpu.ops.ring_attention import SEQ_AXIS, ambient_mesh, ring_mha

        mesh = ambient_mesh()
        if mesh is None or SEQ_AXIS not in mesh.axis_names:
            raise ValueError(
                "implementation='ring' needs an enclosing `with mesh:` whose "
                f"mesh has a {SEQ_AXIS!r} axis (got "
                f"{None if mesh is None else mesh.axis_names})"
            )
        return checkpoint_name(
            ring_mha(q, k, v, mesh=mesh, mask=mask), "mha_out"
        )
    if implementation == "auto":
        # measured on v5e: the Pallas kernel wins 1.65-1.8x at training shapes
        # (many query rows amortize the grid), XLA fused attention wins at
        # small batch-1 decode shapes
        big = q.shape[0] * q.shape[1] >= 4096
        implementation = (
            "pallas" if (jax.default_backend() == "tpu" and big) else "xla"
        )
    if implementation == "pallas":
        from edm_tts_tpu.ops.pallas_attention import flash_mha_diff

        # name the output so remat policies can save it (a pallas_call is not
        # a jaxpr dot — see ConformerConfig.remat_policy)
        return checkpoint_name(flash_mha_diff(q, k, v, mask), "mha_out")

    attn_mask = None
    if mask is not None:
        attn_mask = mask[:, None, None, :]  # (B, 1, 1, Tk) broadcast over heads/q
    # same checkpoint_name as the pallas branch so the "mha"/"dots" remat
    # policies behave identically whichever way auto-dispatch resolves
    return checkpoint_name(
        jax.nn.dot_product_attention(q, k, v, mask=attn_mask, implementation="xla"),
        "mha_out",
    )


def mha_reference(
    q: Array, k: Array, v: Array, *, mask: Array | None = None
) -> Array:
    """Plain einsum-softmax attention; numerical reference for kernel tests."""
    d = q.shape[-1]
    scale = d**-0.5
    sim = jnp.einsum("bihd,bjhd->bhij", q, k) * scale
    if mask is not None:
        sim = jnp.where(mask[:, None, None, :], sim, NEG_INF)
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhij,bjhd->bihd", attn, v)
