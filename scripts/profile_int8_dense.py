"""Crux test: weight-only int8 dense (in-VMEM dequant Pallas kernel) vs the
bf16 matmul it would replace, at the batch-1 sampler shapes.

Thesis: the fused batch-1 samplers are AT the HBM *read* roofline
(~143 GB/s of weight streaming, benchmarks/README.md), so halving weight
bytes should approach 2x on the weight-dominated matmuls — IF the dequant
stays in VMEM. The round-2 crux rejected int8 because XLA materializes the
dequantized bf16 weights through HBM; this measures the Pallas kernel that
does not.

Run on the real chip: python scripts/profile_int8_dense.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import timeit
from edm_tts_tpu.ops.qdense import int8_dense, quantize_weight

# (M, K, N): batch-1 sampler matmul shapes.
# s2a d=1024 T~650 (bucketed 704): ff in/out, to_kv, pw_in, pw_out, fine head
# t2s d=384 T~608: ff in/out, pw_in, pw_out
SHAPES = [
    ("s2a ff_in", 704, 1024, 4096),
    ("s2a ff_out", 704, 4096, 1024),
    ("s2a to_kv", 704, 1024, 2048),
    ("s2a pw_in", 704, 1024, 4096),
    ("s2a pw_out", 704, 2048, 1024),
    ("s2a fine_head", 704, 1024, 8192),
    ("t2s ff_in", 608, 384, 1536),
    ("t2s ff_out", 608, 1536, 384),
    ("batched s2a ff_in", 16 * 704, 1024, 4096),
]


def bench_shape(name, m, k, n):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(key, 1), (k, n), jnp.float32) * 0.02
    wq, ws = quantize_weight(w)
    wb = w.astype(jnp.bfloat16)

    bf16 = jax.jit(lambda x: (x @ wb).astype(jnp.bfloat16))
    xla8 = jax.jit(
        lambda x: int8_dense(x, wq, ws, implementation="xla")
    )
    pl8 = jax.jit(
        lambda x: int8_dense(x, wq, ws, implementation="pallas")
    )

    # numerics sanity (quantization error only, vs f32 matmul)
    ref = np.asarray(x.astype(jnp.float32) @ w)
    got = np.asarray(pl8(x)).astype(np.float32)
    scale = np.abs(ref).max()
    err = np.abs(got - ref).max() / scale
    got_x = np.asarray(xla8(x)).astype(np.float32)
    pl_vs_xla = np.abs(got - got_x).max() / scale

    t_bf = timeit(lambda i: bf16(x), n=30) * 1e3
    t_x8 = timeit(lambda i: xla8(x), n=30) * 1e3
    t_p8 = timeit(lambda i: pl8(x), n=30) * 1e3
    gbs_bf = (k * n * 2) / (t_bf * 1e-3) / 1e9
    gbs_p8 = (k * n * 1) / (t_p8 * 1e-3) / 1e9
    print(
        f"{name:22s} M{m:6d} K{k:5d} N{n:5d} | bf16 {t_bf:7.3f} ms ({gbs_bf:5.1f} GB/s)"
        f" | xla8 {t_x8:7.3f} | pallas8 {t_p8:7.3f} ms ({gbs_p8:5.1f} GB/s)"
        f" | speedup {t_bf / t_p8:4.2f}x | relerr {err:.4f} (vs xla8 {pl_vs_xla:.1e})"
    )


def bench_chain(m=704, d=1024, layers=12):
    """12-layer FF chain (the round-2 crux shape): sustained streaming."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, d), jnp.bfloat16)
    ws = [
        jax.random.normal(jax.random.fold_in(key, i), s, jnp.float32) * 0.02
        for i, s in enumerate([(d, 4 * d), (4 * d, d)] * (layers // 2))
    ]
    wbs = [w.astype(jnp.bfloat16) for w in ws]
    wqs = [quantize_weight(w) for w in ws]

    def chain_bf(x):
        for w in wbs:
            x = jnp.maximum(x @ w, 0).astype(jnp.bfloat16)
        return x

    def chain_p8(x):
        for q, s in wqs:
            x = jnp.maximum(int8_dense(x, q, s, implementation="pallas"), 0)
        return x

    nbytes = sum(w.size for w in ws)
    t_bf = timeit(lambda i: jax.jit(chain_bf)(x), n=30) * 1e3
    t_p8 = timeit(lambda i: jax.jit(chain_p8)(x), n=30) * 1e3
    print(
        f"{layers}-layer FF chain M{m} d{d}: bf16 {t_bf:.3f} ms"
        f" ({nbytes * 2 / t_bf / 1e6:.1f} GB/s) | pallas8 {t_p8:.3f} ms"
        f" ({nbytes / t_p8 / 1e6:.1f} GB/s) | speedup {t_bf / t_p8:.2f}x"
    )


if __name__ == "__main__":
    print(f"backend: {jax.devices()[0]}")
    for args in SHAPES:
        bench_shape(*args)
    bench_chain()
