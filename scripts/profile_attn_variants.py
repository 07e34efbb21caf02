"""Ablation bench for the Pallas attention forward at t2s shape (dev utility).

Isolates where the ~20 ms fwd at (B32, T1408, h16, d24) goes: softmax VPU
work vs per-grid-step overhead vs MXU, by timing kernel variants (no-softmax,
no-exp, bf16-exp) x block_q sizes on the real chip.
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def make_kernel(variant: str, scale: float):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if variant == "nosoftmax":
            p = s
            denom = 1.0
        elif variant == "noexp":
            m = jnp.max(s, axis=-1, keepdims=True)
            p = s - m
            denom = jnp.sum(p, axis=-1, keepdims=True) + 1e6
        elif variant == "bf16exp":
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp((s - m).astype(jnp.bfloat16))
            denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        else:  # full
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / denom
        o_ref[0] = o.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "block_q"))
def attn(q, k, v, variant="full", block_q=256):
    b, tq, h, d = q.shape
    scale = d**-0.5
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, tq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, tq, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, tq, d)
    block_q = min(block_q, tq)
    pad_q = (-tq) % block_q
    if pad_q:
        qf = jnp.pad(qf, ((0, 0), (0, pad_q), (0, 0)))
    grid = (b * h, (tq + pad_q) // block_q)
    out = pl.pallas_call(
        make_kernel(variant, scale),
        out_shape=jax.ShapeDtypeStruct((b * h, tq + pad_q, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tq, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tq, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
    )(qf, kf, vf)
    return out[:, :tq].reshape(b, h, tq, d).transpose(0, 2, 1, 3)


B, T = 32, 1408
rng = jax.random.PRNGKey(0)


def timeit(label, fn, args, n=8):
    out = fn(*args)
    _ = float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:44s} {dt:8.2f} ms", flush=True)
    return dt


h, d = 16, 24
q = jax.random.normal(rng, (B, T, h, d), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(1), (B, T, h, d), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(2), (B, T, h, d), jnp.bfloat16)


def mk(variant, bq):
    return jax.jit(
        lambda q, k, v: jnp.sum(
            attn(q, k, v, variant=variant, block_q=bq).astype(jnp.float32)
        )
    )


for bq in (256, 704, 1408):
    for variant in ("full", "noexp", "nosoftmax", "bf16exp"):
        timeit(f"h{h} d{d} bq{bq} {variant}", mk(variant, bq), (q, k, v))


# -- masked path comparison (the full flash_mha, with and without mask) ------
from edm_tts_tpu.ops.pallas_attention import flash_mha

mask = jnp.ones((B, T), bool)
f_nomask = jax.jit(lambda q, k, v: jnp.sum(flash_mha(q, k, v).astype(jnp.float32)))
f_mask = jax.jit(
    lambda q, k, v, m: jnp.sum(flash_mha(q, k, v, mask=m).astype(jnp.float32))
)
f_mask_lse = jax.jit(
    lambda q, k, v, m: jnp.sum(
        flash_mha(q, k, v, mask=m, return_lse=True)[0].astype(jnp.float32)
    )
)
timeit("flash_mha nomask", f_nomask, (q, k, v))
timeit("flash_mha mask", f_mask, (q, k, v, mask))
timeit("flash_mha mask+lse", f_mask_lse, (q, k, v, mask))
