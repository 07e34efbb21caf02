"""Component microbench of the t2s Conformer block at training shape
(B=32, T=1408, d=384, heads=16, dim_head=24) on the real chip."""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from edm_tts_tpu.models.conformer.conformer import (
    Attention,
    ConformerBlock,
    ConformerConfig,
    ConvModule,
    FeedForward,
)

B, T, D = 32, 1408, 384
HEADS, DH = 16, 24
dtype = jnp.bfloat16
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (B, T, D), dtype)
mask = jnp.ones((B, T), bool)


def timeit(label, fn, *args, n=8):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:46s} {dt:8.2f} ms", flush=True)
    return dt


def fwd_bwd(model, params, *args, **kw):
    def loss(p):
        return jnp.sum(model.apply(p, *args, **kw).astype(jnp.float32))

    return jax.jit(jax.grad(loss))


# -- feedforward ---------------------------------------------------------------
ff = FeedForward(D, 4, 0.0, dtype)
ffp = jax.jit(ff.init)(rng, x)
timeit("FF fwd", jax.jit(lambda p, x: ff.apply(p, x)), ffp, x)
timeit("FF fwd+bwd", fwd_bwd(ff, ffp, x), ffp)

# -- attention: pallas vs xla vs 4-head-64d control ------------------------------
for impl in ("pallas", "xla"):
    att = Attention(D, HEADS, DH, 0.0, implementation=impl, dtype=dtype)
    ap = jax.jit(att.init)(rng, x)
    timeit(f"attn {impl} h16 d24 fwd",
           jax.jit(lambda p, x: att.apply(p, x, mask=mask)), ap, x)
    timeit(f"attn {impl} h16 d24 fwd+bwd",
           fwd_bwd(att, ap, x, mask=mask), ap)

att64 = Attention(D, 6, 64, 0.0, implementation="pallas", dtype=dtype)
ap64 = jax.jit(att64.init)(rng, x)
timeit("attn pallas h6 d64 fwd (control)",
       jax.jit(lambda p, x: att64.apply(p, x, mask=mask)), ap64, x)
timeit("attn pallas h6 d64 fwd+bwd (control)",
       fwd_bwd(att64, ap64, x, mask=mask), ap64)

# -- conv module -----------------------------------------------------------------
conv = ConvModule(D, 2, 5, 0.0, dtype)
cp = jax.jit(conv.init)(rng, x)
timeit("conv k5 fwd", jax.jit(lambda p, x: conv.apply(p, x)), cp, x)
timeit("conv k5 fwd+bwd", fwd_bwd(conv, cp, x), cp)

# -- whole block -------------------------------------------------------------------
cfg = ConformerConfig(dim=D, depth=1, dim_head=DH, heads=HEADS,
                      conv_kernel_size=5)
blk = ConformerBlock(cfg, dtype=dtype)
bp = jax.jit(blk.init)(rng, x)
timeit("block fwd", jax.jit(lambda p, x: blk.apply(p, x, mask=mask)), bp, x)
timeit("block fwd+bwd", fwd_bwd(blk, bp, x, mask=mask), bp)
