"""Pallas fused codec DecoderBlock: snake -> transposed conv (k=2s, stride s)
-> 3 residual units (dil 1/3/9), in ONE kernel pass.

The last two decoder blocks run at 20k-160k samples/s with C <= 192: the
unfused chain (XLA lhs-dilated transposed conv + three fused resunit kernel
launches) pays ~8 tensor-sized HBM round trips per block (~3-3.6 ms each on
v5e, vs a ~0.4 ms read-once/write-once floor). This kernel keeps the whole
block in one VMEM residency:

- the transposed conv uses the 3-tap phase decomposition derived in
  ops/convolution.py::conv_transpose1d_phases (k=2s, p=s/2, even s): three
  shifted (frames, C_in) x (C_in, s*C_out) MXU dots produce all s output
  phases of each frame, and the (frames, s*C_out) -> (frames*s, C_out)
  interleave happens as an in-VMEM reshape — the relayout that costs
  ~1.7 ms/block through XLA (HBM round trip) is register shuffles here;
- the three residual units then consume the extended tile with shrinking
  halos (3*dil rows per side, 39 total), exactly like ops/pallas_resunit.py;
- rows outside the true output range are re-zeroed between stages so
  sequence edges see the same zero padding the unfused convs would.

Forward-only Pallas; a custom VJP recomputes the backward through the plain
jnp composition so codec GAN training is unaffected.

Reference surface: /root/reference/edm_tts/models/dac/decoder.py:11-33
(DecoderBlock: Snake -> ConvTranspose1d(2s, s, pad ceil(s/2)... torch floor
semantics preserved in models/codec/decoder.py) + ResidualUnits 1/3/9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from edm_tts_tpu.ops.snake import cos_fast, snake

Array = jax.Array

_DILS = (1, 3, 9)
_HALO = 40  # >= 3*(1+3+9); divisible by every codec stride (2,4,5,8)


def _phase_weights(kernel: Array, s: int, cin_p: int, cout_p: int) -> Array:
    """(2s, Cin, Cout) transposed-conv kernel -> (3, Cin_p, s*Cout_p) 3-tap
    phase weights (conv_transpose1d_phases derivation; p = s//2, even s)."""
    k, cin, cout = kernel.shape
    assert k == 2 * s and s % 2 == 0
    p = s // 2
    w3 = jnp.zeros((3, cin, s, cout), kernel.dtype)
    for r in range(s):
        if r < s - p:
            w3 = w3.at[0, :, r].set(kernel[s + r + p])  # x[q-1]
            w3 = w3.at[1, :, r].set(kernel[r + p])      # x[q]
        else:
            w3 = w3.at[1, :, r].set(kernel[r + p])      # x[q]
            w3 = w3.at[2, :, r].set(kernel[r + p - s])  # x[q+1]
    w3 = jnp.pad(w3, ((0, 0), (0, cin_p - cin), (0, 0), (0, cout_p - cout)))
    return w3.reshape(3, cin_p, s * cout_p)


def _snake_f32(x, alpha):
    return x + (1.0 - cos_fast(2.0 * alpha * x)) / (2.0 * (alpha + 1e-9))


def _kernel(x_hbm, w3_ref, bias_ref, a0_ref, *ru_and_scratch,
            stride: int, block_f: int, win_f: int, t_frames: int,
            cout_p: int):
    """One output tile: frames [j*block_f - h_f, ...) -> rows
    [j*block_out, (j+1)*block_out). ru_and_scratch: 18 resunit param refs
    (3 units x a1/w7/b7/a2/w1/b1), then o_hbm, then scratch
    (x_vmem, o_vmem, in_sem, out_sem)."""
    ru_refs = ru_and_scratch[:18]
    o_hbm = ru_and_scratch[18]
    x_vmem, o_vmem, in_sem, out_sem = ru_and_scratch[19:]

    s = stride
    h_f = _HALO // s
    n_f = block_f + 2 * h_f
    block_out = block_f * s
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    slot = j % 2
    nxt = (j + 1) % 2

    def in_cp(tile, sl):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(tile * block_f, win_f), :], x_vmem.at[sl],
            in_sem.at[sl],
        )

    @pl.when(j == 0)
    def _():
        in_cp(0, 0).start()

    @pl.when(j + 1 < n_j)
    def _():
        in_cp(j + 1, nxt).start()

    in_cp(j, slot).wait()

    @pl.when(j >= 2)
    def _():
        pltpu.make_async_copy(
            o_vmem.at[slot],
            o_hbm.at[b, pl.ds((j - 2) * block_out, block_out), :],
            out_sem.at[slot],
        ).wait()

    # 1. snake on the input window (window row w = frame j*block_f - h_f-1 + w)
    x = x_vmem[slot].astype(jnp.float32)
    sx = _snake_f32(x, a0_ref[0].astype(jnp.float32))

    # 2. transposed conv as 3 phase dots: fr[q] = sum_m sx[q+m] . w3[m]
    fr = jnp.zeros((n_f, s * cout_p), jnp.float32)
    for m in range(3):
        fr += jax.lax.dot_general(
            sx[m : m + n_f].astype(jnp.bfloat16), w3_ref[m],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    fr = fr + bias_ref[0].astype(jnp.float32)
    # zero frames outside [0, T): sequence edges must read zero padding
    q_global = j * block_f - h_f + jax.lax.broadcasted_iota(
        jnp.int32, (n_f, 1), 0
    )
    fr = jnp.where((q_global >= 0) & (q_global < t_frames), fr, 0.0)

    # 3. interleave phases: (n_f, s*C) -> (n_f*s, C) — in-VMEM relayout
    cur = fr.reshape(n_f * s, cout_p)

    # 4. residual units with shrinking halos; re-zero out-of-range rows so
    # the next unit's conv sees true zero padding at sequence edges
    consumed = 0
    for u, d in enumerate(_DILS):
        a1, w7, b7, a2, w1, b1 = ru_refs[6 * u : 6 * u + 6]
        n_out = cur.shape[0] - 6 * d
        sa = _snake_f32(cur, a1[0].astype(jnp.float32))
        acc = jnp.zeros((n_out, cout_p), jnp.float32)
        for k in range(7):
            acc += jax.lax.dot_general(
                sa[k * d : k * d + n_out].astype(jnp.bfloat16), w7[k],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
        y = acc + b7[0].astype(jnp.float32)
        s2 = _snake_f32(y, a2[0].astype(jnp.float32))
        y2 = jax.lax.dot_general(
            s2.astype(jnp.bfloat16), w1[0],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) + b1[0].astype(jnp.float32)
        cur = cur[3 * d : 3 * d + n_out] + y2
        consumed += 3 * d
        if u < len(_DILS) - 1:
            r_global = j * block_out - _HALO + consumed + (
                jax.lax.broadcasted_iota(jnp.int32, (n_out, 1), 0)
            )
            cur = jnp.where(
                (r_global >= 0) & (r_global < t_frames * s), cur, 0.0
            )

    # consumed == 39, width == block_out + 2: center slice is the tile
    o_vmem[slot] = cur[1 : 1 + block_out].astype(o_vmem.dtype)
    out_cp = pltpu.make_async_copy(
        o_vmem.at[slot], o_hbm.at[b, pl.ds(j * block_out, block_out), :],
        out_sem.at[slot],
    )
    out_cp.start()

    @pl.when(j == n_j - 1)
    def _():
        out_cp.wait()

        @pl.when(n_j >= 2)
        def _():
            pltpu.make_async_copy(
                o_vmem.at[nxt],
                o_hbm.at[b, pl.ds((j - 1) * block_out, block_out), :],
                out_sem.at[nxt],
            ).wait()


def _pad_ru(p, c, c_p):
    """Zero-pad one resunit param set to the padded channel count."""
    a1, w7, b7, a2, w1, b1 = p
    e = c_p - c
    return (
        jnp.pad(a1, (0, e), constant_values=1.0),
        jnp.pad(w7, ((0, 0), (0, e), (0, e))),
        jnp.pad(b7, (0, e)),
        jnp.pad(a2, (0, e), constant_values=1.0),
        jnp.pad(w1, ((0, 0), (0, e), (0, e))),
        jnp.pad(b1, (0, e)),
    )


def _fused_forward(x, alpha0, wt, bt, ru_params, *, stride, block_f=None,
                   interpret=False):
    b, t, cin = x.shape
    cout = wt.shape[2]
    s = stride
    if s % 2 or _HALO % s:
        raise ValueError(
            f"fused decoder block requires an even stride dividing {_HALO}; "
            f"got {s}"
        )
    cin_p = cin + (-cin) % 128
    cout_p = cout + (-cout) % 128

    if block_f is None:
        # keep the f32 (rows, s*cout_p) temporaries ~1.2 MB each
        block_f = max(8, (1_200_000 // (s * cout_p * 4)) // 8 * 8)
    h_f = _HALO // s
    n_tiles = -(-t // block_f)
    win_f = -(-(block_f + 2 * h_f + 2) // 8) * 8
    # pre-pad: h_f+1 zero frames left; right covers tail tile + window slack
    right = (n_tiles - 1) * block_f + win_f - (h_f + 1) - t
    xp = jnp.pad(x, ((0, 0), (h_f + 1, right), (0, cin_p - cin)))

    w3 = _phase_weights(wt, s, cin_p, cout_p).astype(jnp.bfloat16)
    bias3 = jnp.tile(
        jnp.pad(bt, (0, cout_p - cout)), (s,)
    )[None, :]  # (1, s*cout_p)
    a0 = jnp.pad(alpha0, (0, cin_p - cin), constant_values=1.0)[None]
    rus = [_pad_ru(p, cout, cout_p) for p in ru_params]

    ru_args = []
    ru_specs = []
    for a1, w7, b7, a2, w1, b1 in rus:
        ru_args += [
            a1[None].astype(x.dtype), w7.astype(jnp.bfloat16),
            b7[None].astype(jnp.float32), a2[None].astype(x.dtype),
            w1.astype(jnp.bfloat16), b1[None].astype(jnp.float32),
        ]
        ru_specs += [
            pl.BlockSpec((1, cout_p), lambda i, j: (0, 0)),
            pl.BlockSpec((7, cout_p, cout_p), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, cout_p), lambda i, j: (0, 0)),
            pl.BlockSpec((1, cout_p), lambda i, j: (0, 0)),
            pl.BlockSpec((1, cout_p, cout_p), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, cout_p), lambda i, j: (0, 0)),
        ]

    out = pl.pallas_call(
        functools.partial(
            _kernel, stride=s, block_f=block_f, win_f=win_f, t_frames=t,
            cout_p=cout_p,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * block_f * s, cout_p),
                                       x.dtype),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((3, cin_p, s * cout_p), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, s * cout_p), lambda i, j: (0, 0)),
            pl.BlockSpec((1, cin_p), lambda i, j: (0, 0)),
            *ru_specs,
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, win_f, cin_p), x.dtype),
            pltpu.VMEM((2, block_f * s, cout_p), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, w3, bias3, a0.astype(x.dtype), *ru_args)
    return out[:, : t * s, :cout]


def _block_ref(x, alpha0, wt, bt, ru_params, *, stride):
    """Plain jnp composition (reference semantics; backward + tests)."""
    from edm_tts_tpu.ops.convolution import conv_transpose1d
    from edm_tts_tpu.ops.pallas_resunit import _resunit_ref

    y = snake(x, alpha0.astype(x.dtype))
    y = conv_transpose1d(
        y, wt, bt, stride=stride, padding=stride // 2, output_padding=0,
    )
    for d, p in zip(_DILS, ru_params):
        y = _resunit_ref(y, *p, dilation=d)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_decoder_block(x, alpha0, tconv, ru_flat, stride: int):
    """Fused snake -> transposed conv -> 3 residual units (dil 1,3,9).

    Args:
      x: ``(B, T, C_in)``.
      alpha0: ``(C_in,)`` snake alpha.
      tconv: ``(wt, bt)`` — effective (weight-norm-folded) transposed-conv
        kernel ``(2s, C_in, C_out)`` (conv_transpose1d layout) and bias.
      ru_flat: tuple of 3 resunit param tuples ``(alpha1, w7, b7, alpha2,
        w1, b1)`` (folded weights), dilations 1, 3, 9.
      stride: even upsampling factor (the codec's 4 and 2 blocks).

    Returns ``(B, T*stride, C_out)``.
    """
    wt, bt = tconv
    return _fused_forward(x, alpha0, wt, bt, ru_flat, stride=stride)


def _fwd(x, alpha0, tconv, ru_flat, stride):
    out = fused_decoder_block(x, alpha0, tconv, ru_flat, stride)
    return out, (x, alpha0, tconv, ru_flat)


def _bwd(stride, res, g):
    x, alpha0, tconv, ru_flat = res
    _, vjp = jax.vjp(
        lambda x, a0, tc, ru: _block_ref(x, a0, tc[0], tc[1], ru,
                                         stride=stride),
        x, alpha0, tconv, ru_flat,
    )
    return vjp(g)


fused_decoder_block.defvjp(_fwd, _bwd)
