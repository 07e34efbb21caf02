"""Residual vector quantizer (12 x 1024, dim-8, L2-normalized lookup).

TPU-native re-design of the reference RVQ
(/root/reference/edm_tts/models/dac/vector_quantizer.py). Instead of a
ModuleList of 12 per-level modules iterated in Python, all level parameters
are *stacked along a leading Q axis* and the residual loop is a single
``lax.scan`` — one compiled loop body, no per-level dispatch, and the
codebook gathers/projections batch cleanly on the MXU.

Semantics preserved exactly (see reference lines):
- factorized codes: 1x1 weight-normed projections 1024<->8 (VectorQuantize
  :27-30);
- L2-normalized (cosine) codebook lookup (:79-89);
- straight-through estimator ``z_e + sg(z_q - z_e)`` (:63);
- commitment/codebook MSE in the low-dim space, per-sample then
  dropout-masked batch mean (:59-61, ResidualVectorQuantize :196-199);
- the residual is reduced by the *unmasked* out-projected quantized vector
  while the output sum is dropout-masked (:193-195);
- quantizer dropout: first ``floor(B * p)`` samples get a random active level
  count in [1, Q]; everyone else gets ``(n_quantizers or Q) + 1`` — the
  reference's off-by-one (+1) is preserved deliberately (:183-187).

Layout: activations are channel-last ``(B, T, D)``; codes are ``(B, Q, T)``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def _stacked_uniform(fan_in: int):
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def _wn_stacked(v: Array, g: Array) -> Array:
    """Weight norm for ``(Q, In, Out)`` stacked 1x1 convs; norm over In."""
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=1, keepdims=True))
    return v * (g[:, None, :] / norm)


def _l2n(x: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    """torch F.normalize: x / max(||x||, eps)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def _cdist_sq(e: Array, c: Array) -> Array:
    """``||e||^2 - 2 e.c + ||c||^2`` rowwise; e ``(..., d)``, c ``(N, d)``."""
    return (
        jnp.sum(jnp.square(e), axis=-1, keepdims=True)
        - 2.0 * jnp.einsum("...d,nd->...n", e, c)
        + jnp.sum(jnp.square(c), axis=-1)
    )


class ResidualVQ(nn.Module):
    input_dim: int = 1024
    n_codebooks: int = 12
    codebook_size: int = 1024
    codebook_dim: int = 8
    quantizer_dropout: float = 0.0
    dtype: Any = jnp.float32  # VQ math stays f32; dtype applies to projections

    def setup(self):
        q, d, dc, n = (
            self.n_codebooks,
            self.input_dim,
            self.codebook_dim,
            self.codebook_size,
        )
        self.in_proj_v = self.param("in_proj_v", _stacked_uniform(d), (q, d, dc))
        self.in_proj_g = self.param(
            "in_proj_g",
            lambda k, _: jnp.sqrt(jnp.sum(jnp.square(self.in_proj_v), axis=1)),
            None,
        )
        self.in_proj_b = self.param("in_proj_b", _stacked_uniform(d), (q, dc))
        self.codebook = self.param(
            "codebook", nn.initializers.normal(stddev=1.0), (q, n, dc)
        )
        self.out_proj_v = self.param("out_proj_v", _stacked_uniform(dc), (q, dc, d))
        self.out_proj_g = self.param(
            "out_proj_g",
            lambda k, _: jnp.sqrt(jnp.sum(jnp.square(self.out_proj_v), axis=1)),
            None,
        )
        self.out_proj_b = self.param("out_proj_b", _stacked_uniform(dc), (q, d))

    def _weights(self):
        w_in = _wn_stacked(self.in_proj_v, self.in_proj_g)
        w_out = _wn_stacked(self.out_proj_v, self.out_proj_g)
        return w_in, w_out

    def active_level_thresholds(
        self,
        rng: Array | None,
        batch_size: int,
        n_quantizers: int | None,
        train: bool,
    ) -> Array:
        """Per-sample threshold ``thr``; level q participates iff ``q < thr``."""
        base = float((n_quantizers or self.n_codebooks) + 1)
        thr = jnp.full((batch_size,), base, dtype=jnp.float32)
        if train and self.quantizer_dropout > 0.0:
            if rng is None:
                raise ValueError("quantizer dropout requires an rng")
            draws = jax.random.randint(
                rng, (batch_size,), 1, self.n_codebooks + 1
            ).astype(jnp.float32)
            n_dropout = int(batch_size * self.quantizer_dropout)
            take = jnp.arange(batch_size) < n_dropout
            thr = jnp.where(take, draws, thr)
        return thr

    def __call__(
        self,
        z: Array,
        n_quantizers: int | None = None,
        *,
        train: bool = False,
        rng: Array | None = None,
    ) -> dict[str, Array]:
        """Quantize ``(B, T, D)`` latents through all levels.

        Returns dict with ``z`` (B,T,D), ``codes`` (B,Q,T) int32, ``latents``
        (B,T,Q,dc) pre-quantization projections, and the two VQ losses.
        """
        z = z.astype(jnp.float32)
        b = z.shape[0]
        w_in, w_out = self._weights()
        thr = self.active_level_thresholds(rng, b, n_quantizers, train)
        level_mask = (
            jnp.arange(self.n_codebooks, dtype=jnp.float32)[:, None] < thr[None, :]
        )  # (Q, B)

        def body(carry, xs):
            residual, z_sum, commit_sum, cb_sum = carry
            wi, bi, cb, wo, bo, mask_b = xs
            z_e = jnp.einsum("btd,dc->btc", residual, wi) + bi
            dist = _cdist_sq(_l2n(z_e), _l2n(cb))
            idx = jnp.argmin(dist, axis=-1)  # (B, T)
            z_q = cb[idx]
            commit = jnp.mean(
                jnp.square(z_e - lax.stop_gradient(z_q)), axis=(1, 2)
            )
            cbl = jnp.mean(jnp.square(z_q - lax.stop_gradient(z_e)), axis=(1, 2))
            z_st = z_e + lax.stop_gradient(z_q - z_e)
            out = jnp.einsum("btc,cd->btd", z_st, wo) + bo
            z_sum = z_sum + out * mask_b[:, None, None]
            commit_sum = commit_sum + jnp.mean(commit * mask_b)
            cb_sum = cb_sum + jnp.mean(cbl * mask_b)
            return (residual - out, z_sum, commit_sum, cb_sum), (idx, z_e)

        init = (z, jnp.zeros_like(z), jnp.float32(0.0), jnp.float32(0.0))
        (_, z_q, commit, cbl), (codes, latents) = lax.scan(
            body,
            init,
            (w_in, self.in_proj_b, self.codebook, w_out, self.out_proj_b, level_mask),
        )
        return {
            "z": z_q,
            "codes": jnp.transpose(codes, (1, 0, 2)).astype(jnp.int32),
            "latents": jnp.transpose(latents, (1, 2, 0, 3)),  # (B,T,Q,dc)
            "vq/commitment_loss": commit,
            "vq/codebook_loss": cbl,
        }

    def from_codes(self, codes: Array) -> Array:
        """``(B, Q', T)`` codes -> summed quantized features ``(B, T, D)``.

        Supports Q' <= Q leading levels (used by the s2a dynamic injection).
        """
        z_p = self.embed_codes(codes)  # (B, Q', T, dc)
        nq = codes.shape[1]
        _, w_out = self._weights()
        z_q = jnp.einsum("bqtc,qcd->btd", z_p, w_out[:nq])
        return z_q + jnp.sum(self.out_proj_b[:nq], axis=0)

    def from_codes_unreduced(self, codes: Array) -> Array:
        """``(B, Q', T)`` codes -> per-level features ``(B, Q', T, D)``."""
        z_p = self.embed_codes(codes)
        nq = codes.shape[1]
        _, w_out = self._weights()
        return (
            jnp.einsum("bqtc,qcd->bqtd", z_p, w_out[:nq])
            + self.out_proj_b[:nq][None, :, None, :]
        )

    def embed_codes(self, codes: Array) -> Array:
        """``(B, Q', T)`` codes -> raw codebook vectors ``(B, Q', T, dc)``."""
        nq = codes.shape[1]
        return jax.vmap(lambda c, cb: cb[c], in_axes=(1, 0), out_axes=1)(
            codes.astype(jnp.int32), self.codebook[:nq]
        )

    def from_latents(self, latents: Array) -> tuple[Array, Array, Array]:
        """``(B, T, Q'*dc)`` projected latents -> (z_q, z_p, codes).

        Each per-level slice is L2-normalize-matched against its codebook
        (no in_proj: the latents are already in codebook space), mirroring
        reference ``from_latents`` (:254-283).
        """
        nq = latents.shape[-1] // self.codebook_dim
        _, w_out = self._weights()
        parts = latents.reshape(*latents.shape[:-1], nq, self.codebook_dim)
        dist = jax.vmap(
            lambda p, c: _cdist_sq(_l2n(p), _l2n(c)), in_axes=(2, 0), out_axes=2
        )(parts, self.codebook[:nq])  # (B,T,Q',N)
        codes = jnp.argmin(dist, axis=-1)  # (B,T,Q')
        z_p = jax.vmap(lambda c, cb: cb[c], in_axes=(2, 0), out_axes=2)(
            codes, self.codebook[:nq]
        )  # (B,T,Q',dc)
        z_q = jnp.einsum("btqc,qcd->btd", z_p, w_out[:nq]) + jnp.sum(
            self.out_proj_b[:nq], axis=0
        )
        return z_q, z_p, jnp.transpose(codes, (0, 2, 1)).astype(jnp.int32)

    def latents_to_codebook_dist(self, latents: Array) -> Array:
        """``(B, T, D)`` features -> residual-VQ distances ``(B, T, Q, N)``.

        Mirrors reference ``latents_to_codebook_dist`` (:285-315): at each
        level the residual is in-projected, normalized-matched, and reduced by
        the out-projected (non-straight-through) quantized vector.
        """
        w_in, w_out = self._weights()

        def body(residual, xs):
            wi, bi, cb, wo, bo = xs
            z_e = jnp.einsum("btd,dc->btc", residual, wi) + bi
            dist = _cdist_sq(_l2n(z_e), _l2n(cb))
            idx = jnp.argmin(dist, axis=-1)
            out = jnp.einsum("btc,cd->btd", cb[idx], wo) + bo
            return residual - out, dist

        _, dists = lax.scan(
            body,
            latents.astype(jnp.float32),
            (w_in, self.in_proj_b, self.codebook, w_out, self.out_proj_b),
        )
        return jnp.transpose(dists, (1, 2, 0, 3))

    def continuous_to_quantized_features(self, latents: Array) -> Array:
        """Full VQ pass on given ``(B, T, D)`` features -> summed quantized
        features (reference :317-325; no dropout, no losses)."""
        return self(latents)["z"]

    def continuous_to_codes(self, latents: Array) -> Array:
        """Full VQ pass on given ``(B, T, D)`` features -> ``(B, Q, T)`` codes
        (reference :327-338)."""
        return self(latents)["codes"]

    def get_projected_codebook(self, codebook_idx: int) -> Array:
        """Out-projected codebook table ``(N, D)`` for one level."""
        _, w_out = self._weights()
        return (
            self.codebook[codebook_idx] @ w_out[codebook_idx]
            + self.out_proj_b[codebook_idx]
        )
