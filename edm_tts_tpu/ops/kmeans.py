"""Jitted Lloyd's-iteration k-means (replaces faiss).

The reference builds the 1024-centroid semantic codebook with faiss-cpu
(utility_scripts/hubert_kmeans/dump_features_and_kmeans.py:102-104: K=1024,
niter=20, nredo=5, seed 42, ~1.024M HuBERT frames). On TPU the E-step is a
single big (N, D) x (D, K) matmul on the MXU and the M-step a segment-sum —
one jitted ``lax.scan`` over iterations per restart, with k-means++-style
random-point init and empty-cluster re-seeding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _assign(x: Array, centers: Array) -> tuple[Array, Array]:
    """Nearest-center assignment; returns (labels, sq distance)."""
    d = (
        jnp.sum(x * x, axis=-1, keepdims=True)
        - 2.0 * x @ centers.T
        + jnp.sum(centers * centers, axis=-1)
    )
    labels = jnp.argmin(d, axis=-1)
    return labels, jnp.take_along_axis(d, labels[:, None], axis=-1)[:, 0]


@functools.partial(jax.jit, static_argnames=("k", "niter"))
def _kmeans_once(x: Array, key: Array, *, k: int, niter: int):
    n = x.shape[0]
    init_idx = jax.random.choice(key, n, (k,), replace=False)
    centers0 = x[init_idx]

    def step(carry, _):
        centers, key = carry
        labels, dists = _assign(x, centers)
        one_hot = jax.nn.one_hot(labels, k, dtype=x.dtype)  # (N, K)
        counts = jnp.sum(one_hot, axis=0)  # (K,)
        sums = one_hot.T @ x  # (K, D)
        new_centers = sums / jnp.maximum(counts, 1.0)[:, None]
        # re-seed empty clusters with random points
        key, sub = jax.random.split(key)
        reseed = x[jax.random.choice(sub, n, (k,))]
        new_centers = jnp.where((counts > 0)[:, None], new_centers, reseed)
        return (new_centers, key), jnp.sum(dists)

    (centers, _), inertia = jax.lax.scan(step, (centers0, key), None, length=niter)
    _, dists = _assign(x, centers)
    return centers, jnp.sum(dists)


def kmeans(
    x: Array,
    k: int,
    *,
    niter: int = 20,
    nredo: int = 5,
    seed: int = 42,
) -> tuple[Array, Array]:
    """Best-of-``nredo`` Lloyd's k-means. Returns (centers (K, D), inertia)."""
    x = jnp.asarray(x, jnp.float32)
    best_centers, best_inertia = None, jnp.inf
    key = jax.random.PRNGKey(seed)
    for r in range(nredo):
        key, sub = jax.random.split(key)
        centers, inertia = _kmeans_once(x, sub, k=k, niter=niter)
        if best_centers is None or float(inertia) < float(best_inertia):
            best_centers, best_inertia = centers, inertia
    return best_centers, best_inertia
