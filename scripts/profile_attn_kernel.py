"""Kernel-only attention timings at t2s/s2a training shapes (dev utility).

Times flash_mha fwd and fwd+bwd on pre-formed (B,T,H,D) arrays with a
device-side iteration chain (axon block_until_ready doesn't sync; chain
the output into the next input and read back one scalar).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from edm_tts_tpu.ops.pallas_attention import flash_mha, flash_mha_diff

B, T = 32, 1408
rng = jax.random.PRNGKey(0)


def timeit(label, fn, args, n=8):
    out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:44s} {dt:8.2f} ms", flush=True)
    return dt


for h, d in ((16, 24), (6, 64), (16, 64), (3, 128)):
    q = jax.random.normal(rng, (B, T, h, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, h, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, h, d), jnp.bfloat16)
    mask = jnp.ones((B, T), bool)

    fwd = jax.jit(
        lambda q, k, v, m: jnp.sum(flash_mha(q, k, v, mask=m).astype(jnp.float32))
    )
    timeit(f"flash fwd  h{h} d{d}", fwd, (q, k, v, mask))

    def loss(q, k, v, m):
        return jnp.sum(flash_mha_diff(q, k, v, m).astype(jnp.float32))

    gsum = jax.jit(
        lambda q, k, v, m: sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.grad(loss, (0, 1, 2))(q, k, v, m)
        )
    )
    timeit(f"flash fwd+bwd h{h} d{d}", gsum, (q, k, v, mask))
