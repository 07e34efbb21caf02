"""Compare conv1d implementations on TPU: lax.conv vs sum-of-shifted-matmuls."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

dtype = jnp.bfloat16
rng = jax.random.PRNGKey(0)
N = 20


def bench(name, fn, *args):
    def f(x, *rest):
        def body(i, acc):
            out = fn(x + (acc * 1e-9).astype(x.dtype), *rest)
            return jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

    f = jax.jit(f)
    _ = float(f(*args))
    t0 = time.perf_counter()
    _ = float(f(*args))
    print(f"{name}: {(time.perf_counter() - t0) / N * 1e3:.2f} ms", flush=True)


def conv_lax(x, w, stride=1, pad=3, dil=1):
    return lax.conv_general_dilated(
        x, w, (stride,), ((pad, pad),), rhs_dilation=(dil,),
        dimension_numbers=("NHC", "HIO", "NHC"))


def conv_shift(x, w, pad=3, dil=1):
    # y[t] = sum_k x[t + k*dil - pad] @ w[k]
    k = w.shape[0]
    t = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (pad, pad + dil * k), (0, 0)))
    out = None
    for i in range(k):
        xi = lax.dynamic_slice_in_dim(xp, i * dil, t, axis=1)
        y = jnp.einsum("btc,cd->btd", xi, w[i],
                       preferred_element_type=jnp.float32)
        out = y if out is None else out + y
    return out.astype(x.dtype)


for (T, C, Co, k, dil) in [(160016, 96, 96, 7, 1), (160016, 96, 96, 7, 9),
                            (80008, 192, 192, 7, 1), (20002, 384, 384, 7, 9),
                            (160016, 96, 96, 1, 1)]:
    x = jax.random.normal(rng, (1, T, C), dtype)
    w = jax.random.normal(rng, (k, C, Co), dtype) * 0.05
    pad = ((k - 1) * dil) // 2
    bench(f"lax   T{T} C{C} k{k} d{dil}", lambda x, w: conv_lax(x, w, pad=pad, dil=dil), x, w)
    bench(f"shift T{T} C{C} k{k} d{dil}", lambda x, w: conv_shift(x, w, pad=pad, dil=dil), x, w)
