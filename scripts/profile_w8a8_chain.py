"""Crux probe: W8A8 dynamic int8 (native s8xs8 MXU dot, XLA-fused dynamic
activation quant) vs bf16 and vs the weight-only Pallas dequant kernel, on a
sustained FF chain at the batch-1 sampler shapes.

Why: both weight-only variants lost — XLA weight-only materializes the
dequantized weights through HBM (round-2 crux), and the Pallas in-VMEM
dequant kernel loses its byte win to per-call launch overhead + lost fusion
(round-3 sampler A/B: t2s 15.3 -> 20.3 ms). W8A8 is the one int8 form XLA
runs natively: s8 weights stream straight into the MXU (half the bytes, no
dequant pass), activations are quantized per row on the VPU (fused), and the
f32 rescale fuses into the epilogue.

Run on the real chip: python scripts/profile_w8a8_chain.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import timeit
from edm_tts_tpu.ops.qdense import int8_dense, quantize_weight


def w8a8(x, wq, wscale):
    """Per-row dynamic activation quant + native s8xs8 -> s32 dot."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    xscale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / xscale), -127, 127
    ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * xscale * wscale[None, :]).astype(x.dtype)


def bench_chain(name, m, d, layers=12):
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

    def chain_w8a8(x):
        for q, s in wqs:
            x = jnp.maximum(w8a8(x, q, s), 0)
        return x

    def chain_pl8(x):
        for q, s in wqs:
            x = jnp.maximum(int8_dense(x, q, s, implementation="pallas"), 0)
        return x

    # numerics: relative error vs the f32 chain
    def chain_f32(x):
        for w in ws:
            x = jnp.maximum(x @ w, 0)
        return x

    ref = np.asarray(jax.jit(chain_f32)(x.astype(jnp.float32)))
    got = np.asarray(jax.jit(chain_w8a8)(x)).astype(np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)

    nbytes = sum(w.size for w in ws)
    t_bf = timeit(lambda i: jax.jit(chain_bf)(x), n=30) * 1e3
    t_w8 = timeit(lambda i: jax.jit(chain_w8a8)(x), n=30) * 1e3
    t_p8 = timeit(lambda i: jax.jit(chain_pl8)(x), n=30) * 1e3
    print(
        f"{name}: {layers}-layer FF chain M{m} d{d}\n"
        f"  bf16   {t_bf:7.3f} ms ({nbytes * 2 / t_bf / 1e6:6.1f} GB/s)\n"
        f"  w8a8   {t_w8:7.3f} ms ({nbytes / t_w8 / 1e6:6.1f} GB/s int8)"
        f"  speedup {t_bf / t_w8:4.2f}x  relerr {err:.4f}\n"
        f"  pallas8 {t_p8:6.3f} ms ({nbytes / t_p8 / 1e6:6.1f} GB/s int8)"
        f"  speedup {t_bf / t_p8:4.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    print(f"backend: {jax.devices()[0]}")
    bench_chain("t2s", 608, 384)
    bench_chain("s2a", 704, 1024)
    bench_chain("batched s2a", 16 * 704, 1024)
