"""Ring attention: sequence-parallel multi-head attention over an ICI ring.

The reference has no sequence parallelism (its sequences are <= ~2.5k,
/root/reference/edm_tts/models/conformer/attend.py computes full attention
on one GPU). This is the TPU pod-scale extension for contexts that outgrow
one chip's HBM: shard the sequence over a ``sequence`` mesh axis, keep Q
resident, and rotate the K/V (+key-mask) shards around the ring with
``lax.ppermute`` while accumulating the softmax online (flash-attention
style running max / denominator), so no device ever materializes the full
(T, T) score matrix or the full K/V.

Design notes (TPU-first):
- One ``lax.ppermute`` per step moves every shard to its neighbor
  simultaneously — the ring rides adjacent ICI links, and XLA overlaps the
  collective with the block matmuls of the previous step.
- The S-step loop is a ``lax.scan`` inside ``shard_map``: one compiled
  program, differentiable end-to-end (the backward re-runs the ring in
  reverse via the transpose of ppermute).
- Accumulation in f32 regardless of input dtype (bf16-safe), matching the
  Pallas flash kernel's convention (ops/pallas_attention.py).

Semantics match ``ops/attention.py::mha_reference`` (bidirectional,
key-padding mask True = attend) — pinned by tests/test_ring_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from edm_tts_tpu.ops.attention import NEG_INF

Array = jax.Array

SEQ_AXIS = "sequence"


def _ring_attn_local(q: Array, k: Array, v: Array, mask: Array | None,
                     axis_name: str) -> Array:
    """Per-device body: q,k,v (B, T_local, H, D); mask (B, T_local) or None.

    Rotates (k, v, mask) around ``axis_name`` and accumulates the online
    softmax against the resident q block.
    """
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    scale = q.shape[-1] ** -0.5
    qf = q.astype(jnp.float32) * scale

    b, tq, h, d = q.shape
    o0 = jnp.zeros((b, tq, h, d), jnp.float32)
    m0 = jnp.full((b, h, tq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, tq), jnp.float32)

    def step(carry, _):
        o, m, l, k_blk, v_blk, mask_blk = carry
        s = jnp.einsum("bihd,bjhd->bhij", qf, k_blk.astype(jnp.float32))
        if mask_blk is not None:
            s = s + jnp.where(mask_blk, 0.0, NEG_INF)[:, None, None, :]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l_new = l * corr + jnp.sum(p, axis=-1)
        o_new = o * corr.transpose(0, 2, 1)[..., None] + jnp.einsum(
            "bhij,bjhd->bihd", p, v_blk.astype(jnp.float32)
        )
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        if mask_blk is not None:
            mask_blk = jax.lax.ppermute(mask_blk, axis_name, perm)
        return (o_new, m_new, l_new, k_blk, v_blk, mask_blk), None

    (o, m, l, _, _, _), _ = jax.lax.scan(
        step, (o0, m0, l0, k, v, mask), None, length=n
    )
    # fully-masked rows (all keys invalid) keep l == 0: emit zeros, not NaN
    denom = jnp.where(l == 0.0, 1.0, l).transpose(0, 2, 1)[..., None]
    return (o / denom).astype(q.dtype)


def make_seq_mesh(n_seq: int, devices=None) -> Mesh:
    """1-D mesh with a single ``sequence`` axis (ring laid out along ICI)."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_seq
    return Mesh(np.asarray(devices[:n_seq]), (SEQ_AXIS,))


def ambient_mesh() -> Mesh | None:
    """The mesh of the innermost enclosing ``with mesh:`` block, or None.

    This is how the model stack reaches the ring without plumbing a Mesh
    through every (serializable) model config: the trainers/inference paths
    already trace their jitted programs under ``with mesh:``
    (train/trainer.py, __graft_entry__.dryrun_multichip), so
    ``ConformerConfig(attn_implementation="ring")`` can resolve it at trace
    time. Uses the internal accessor (the public alias is deprecation-warned
    in jax 0.9) with the public one as fallback.
    """
    try:
        from jax._src.mesh import thread_resources
    except ImportError:  # pragma: no cover - older/newer jax layouts
        from jax.interpreters.pxla import thread_resources
    m = thread_resources.env.physical_mesh
    return None if m.empty else m


def ring_mha(
    q: Array,
    k: Array,
    v: Array,
    *,
    mesh: Mesh,
    mask: Array | None = None,
    axis_name: str = SEQ_AXIS,
    batch_axis: str | None = "auto",
) -> Array:
    """Sequence-parallel bidirectional MHA.

    Args are GLOBAL arrays: q, k, v ``(B, T, H, D)``, mask ``(B, T)`` bool
    (True = attend). T is sharded over ``axis_name``; the batch dim is
    sharded over ``batch_axis`` ("auto": the mesh's ``data`` axis when it
    has one — dp x sp composition — else replicated). Returns the global
    ``(B, T, H, D)`` output, sharded the same way (callers under jit see a
    normal array; XLA keeps it sharded).
    """
    t = q.shape[1]
    n = mesh.shape[axis_name]
    assert t % n == 0, f"sequence {t} not divisible by {n} ring devices"
    if batch_axis == "auto":
        batch_axis = "data" if "data" in mesh.axis_names else None

    body = functools.partial(_ring_attn_local, axis_name=axis_name)
    qkv_spec = P(batch_axis, axis_name, None, None)
    mask_spec = P(batch_axis, axis_name) if mask is not None else None
    if mask is None:
        return shard_map(
            lambda q, k, v: body(q, k, v, None),
            mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec),
            out_specs=qkv_spec,
            check_rep=False,
        )(q, k, v)
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, mask_spec),
        out_specs=qkv_spec,
        check_rep=False,
    )(q, k, v, mask)
