"""Pallas fused codec ResidualUnit: snake -> dilated k=7 conv -> snake ->
k=1 conv -> residual add, in ONE kernel pass.

The codec decoder is the RTF bottleneck (SURVEY.md §7): at audio rate the
unfused XLA composition materializes ~5 tensor-sized HBM round trips per
residual unit (~3 ms at 80k x 192 on v5e). This kernel reads the input once
(tile + conv halo via async DMA from HBM), keeps everything in VMEM, runs
the k=7 dilated conv as 7 shifted (bt, C) x (C, C) MXU matmuls with f32
accumulation, and writes the output once — measured ~2x per unit and ~1.7x
on the whole decoder.

Forward-only Pallas; a custom VJP recomputes the backward through the plain
jnp composition so codec GAN training is unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from edm_tts_tpu.ops.snake import cos_fast, snake

Array = jax.Array


def _resunit_ref(x, alpha1, w7, b7, alpha2, w1, b1, *, dilation):
    """Plain jnp composition (reference semantics; used for backward + tests)."""
    from edm_tts_tpu.ops.convolution import conv1d

    pad = 3 * dilation
    s = snake(x, alpha1)
    y = conv1d(s, w7, b7, padding=pad, dilation=dilation)
    s2 = snake(y, alpha2)
    y2 = jnp.einsum("btc,cd->btd", s2, w1[0]) + b1
    return x + y2.astype(x.dtype)


def _kernel(x_hbm, a1_ref, w7_ref, b7_ref, a2_ref, w1_ref, b1_ref, o_hbm,
            x_vmem, o_vmem, sem, out_sem, *, dilation: int, block_t: int,
            halo: int, window: int):
    """Double-buffered: slot j%2 of x_vmem holds tile j's window; tile j+1's
    DMA is issued before computing tile j; the output DMA of tile j is only
    awaited two steps later (before its slot is reused)."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    slot = j % 2
    nxt = (j + 1) % 2

    def in_cp(tile, s):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(tile * block_t, window), :], x_vmem.at[s],
            sem.at[s],
        )

    @pl.when(j == 0)
    def _():
        in_cp(0, 0).start()

    @pl.when(j + 1 < n_j)
    def _():
        in_cp(j + 1, nxt).start()

    in_cp(j, slot).wait()

    # before writing o_vmem[slot], make sure its previous output DMA is done
    @pl.when(j >= 2)
    def _():
        pltpu.make_async_copy(
            o_vmem.at[slot],
            o_hbm.at[b, pl.ds((j - 2) * block_t, block_t), :],
            out_sem.at[slot],
        ).wait()

    x = x_vmem[slot].astype(jnp.float32)
    a1 = a1_ref[0].astype(jnp.float32)
    # snake via fast cos poly (ops/snake.py): sin^2(u) = (1 - cos(2u)) / 2
    s = x + (1.0 - cos_fast(2.0 * a1 * x)) / (2.0 * (a1 + 1e-9))

    acc = jnp.zeros((block_t, x.shape[-1]), jnp.float32)
    for k in range(7):
        xs = s[k * dilation : k * dilation + block_t, :]
        acc += jax.lax.dot_general(
            xs.astype(jnp.bfloat16), w7_ref[k].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    y = acc + b7_ref[0].astype(jnp.float32)

    a2 = a2_ref[0].astype(jnp.float32)
    s2 = y + (1.0 - cos_fast(2.0 * a2 * y)) / (2.0 * (a2 + 1e-9))
    y2 = jax.lax.dot_general(
        s2.astype(jnp.bfloat16), w1_ref[0].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)

    center = x[halo : halo + block_t, :]
    o_vmem[slot] = (center + y2).astype(o_vmem.dtype)
    out_cp = pltpu.make_async_copy(
        o_vmem.at[slot], o_hbm.at[b, pl.ds(j * block_t, block_t), :],
        out_sem.at[slot],
    )
    out_cp.start()

    # drain pending output DMAs on the last step of this batch row
    @pl.when(j == n_j - 1)
    def _():
        out_cp.wait()

        @pl.when(n_j >= 2)
        def _():
            pltpu.make_async_copy(
                o_vmem.at[nxt],
                o_hbm.at[b, pl.ds((j - 1) * block_t, block_t), :],
                out_sem.at[nxt],
            ).wait()


def _fused_forward(x, alpha1, w7, b7, alpha2, w1, b1, *, dilation,
                   block_t=None):
    b, t, c = x.shape
    # Mosaic DMA slices need 128-aligned lane (channel) dims; zero-pad the
    # channel axis (exact: zero weights keep padded outputs at zero, snake(0)
    # = 0, residual adds the zero input back)
    c_pad = (-c) % 128
    if c_pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, c_pad)))
        alpha1 = jnp.pad(alpha1, (0, c_pad), constant_values=1.0)
        alpha2 = jnp.pad(alpha2, (0, c_pad), constant_values=1.0)
        w7 = jnp.pad(w7, ((0, 0), (0, c_pad), (0, c_pad)))
        w1 = jnp.pad(w1, ((0, 0), (0, c_pad), (0, c_pad)))
        b7 = jnp.pad(b7, (0, c_pad))
        b1 = jnp.pad(b1, (0, c_pad))
        out = _fused_forward(
            x, alpha1, w7, b7, alpha2, w1, b1, dilation=dilation,
            block_t=block_t,
        )
        return out[:, :, :c]
    if block_t is None:
        # keep the kernel's f32 temporaries (~8 tiles of block_t x C) inside
        # the 16 MB VMEM budget: ~200k elements per tile
        block_t = max(256, (196608 // c) // 8 * 8)
    halo = 3 * dilation
    pad_t = (-t) % block_t
    window = -(-(block_t + 2 * halo) // 8) * 8  # DMA slices must be 8-aligned
    n_blocks = (t + pad_t) // block_t
    # pre-pad: halo left; right pad covers halo + tile remainder + window slack
    right = (n_blocks - 1) * block_t + window - halo - t
    xp = jnp.pad(x, ((0, 0), (halo, right), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _kernel, dilation=dilation, block_t=block_t, halo=halo,
            window=window,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t + pad_t, c), x.dtype),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((7, c, c), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c, c), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, window, c), x.dtype),
            pltpu.VMEM((2, block_t, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(
        xp,
        alpha1[None].astype(x.dtype),
        w7.astype(x.dtype),
        b7[None].astype(x.dtype),
        alpha2[None].astype(x.dtype),
        w1.astype(x.dtype),
        b1[None].astype(x.dtype),
    )
    return out[:, :t, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_residual_unit(x, alpha1, w7, b7, alpha2, w1, b1, dilation: int):
    """Fused snake->conv7(dilated)->snake->conv1->residual.

    Args:
      x: ``(B, T, C)``; w7: ``(7, C, C)`` effective (weight-norm-folded)
      kernel; w1: ``(1, C, C)``; alphas/biases ``(C,)``.
    """
    return _fused_forward(x, alpha1, w7, b7, alpha2, w1, b1, dilation=dilation)


def _fwd(x, alpha1, w7, b7, alpha2, w1, b1, dilation):
    out = _fused_forward(x, alpha1, w7, b7, alpha2, w1, b1, dilation=dilation)
    return out, (x, alpha1, w7, b7, alpha2, w1, b1)


def _bwd(dilation, res, g):
    x, alpha1, w7, b7, alpha2, w1, b1 = res
    _, vjp = jax.vjp(
        lambda *a: _resunit_ref(*a, dilation=dilation),
        x, alpha1, w7, b7, alpha2, w1, b1,
    )
    return vjp(g)


fused_residual_unit.defvjp(_fwd, _bwd)
