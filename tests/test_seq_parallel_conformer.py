"""Sequence parallelism integrated into the model stack: a full Conformer
(FF / MHSA+RoPE / depthwise-conv / FF / LN blocks) runs with its activations
sharded over a ``sequence`` mesh axis — ring attention handles the MHA
(ops/ring_attention.py via ``ConformerConfig(attn_implementation="ring")``),
GSPMD handles everything else (halo exchange for the depthwise conv,
per-position LN/FF) — and computes EXACTLY what the unsharded model computes,
forward and gradients, composed with data parallelism.

The reference computes full attention on one GPU (sequences <= ~2.5k,
/root/reference/edm_tts/models/conformer/attend.py); this is the pod-scale
long-context extension.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from edm_tts_tpu.models.conformer.conformer import Conformer, ConformerConfig

CFG = ConformerConfig(dim=32, depth=2, dim_head=16, heads=2, conv_kernel_size=7)
B, T = 4, 64


def _setup():
    model = Conformer(CFG)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, CFG.dim), jnp.float32)
    params = jax.jit(model.init)(rng, x)
    # ragged valid lengths; the mask rides into the ring as the key-padding
    # mask and into the conv as conv_pad_mask
    lengths = jnp.array([64, 48, 33, 17])
    mask = jnp.arange(T)[None, :] < lengths[:, None]
    return model, params, x, mask


def _mesh(n_data, n_seq):
    devs = np.asarray(jax.devices()[: n_data * n_seq]).reshape(n_data, n_seq)
    return Mesh(devs, ("data", "sequence"))


def _shard(mesh, x, spec):
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


@pytest.mark.parametrize("n_data,n_seq", [(1, 8), (2, 4)])
def test_seq_parallel_forward_matches_unsharded(n_data, n_seq):
    model, params, x, mask = _setup()
    ref = model.apply(params, x, mask=mask, conv_pad_mask=mask)

    ring_model = Conformer(dataclasses.replace(CFG, attn_implementation="ring"))
    mesh = _mesh(n_data, n_seq)
    xs = _shard(mesh, x, ("data", "sequence", None))
    ms = _shard(mesh, mask, ("data", "sequence"))
    with mesh:
        out = jax.jit(
            lambda p, x, m: ring_model.apply(p, x, mask=m, conv_pad_mask=m)
        )(params, xs, ms)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_seq_parallel_gradients_match_unsharded():
    model, params, x, mask = _setup()

    def loss_ref(p):
        y = model.apply(p, x, mask=mask, conv_pad_mask=mask)
        return jnp.mean(jnp.square(y) * mask[..., None])

    g_ref = jax.grad(loss_ref)(params)

    ring_model = Conformer(dataclasses.replace(CFG, attn_implementation="ring"))
    mesh = _mesh(2, 4)
    xs = _shard(mesh, x, ("data", "sequence", None))
    ms = _shard(mesh, mask, ("data", "sequence"))

    def loss_ring(p, x, m):
        y = ring_model.apply(p, x, mask=m, conv_pad_mask=m)
        return jnp.mean(jnp.square(y) * m[..., None])

    with mesh:
        g = jax.jit(jax.grad(loss_ring))(params, xs, ms)
    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    flat, _ = jax.tree_util.tree_flatten(g)
    for a, b in zip(flat, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_ring_requires_mesh_context():
    model, params, x, mask = _setup()
    ring_model = Conformer(dataclasses.replace(CFG, attn_implementation="ring"))
    with pytest.raises(ValueError, match="sequence"):
        ring_model.apply(params, x, mask=mask)
