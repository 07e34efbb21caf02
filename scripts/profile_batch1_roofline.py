"""Batch-1 roofline: per-stage weight bytes vs measured latency.

Reconciles the round-2 calibration gap (a bare double-buffered Pallas HBM
copy sustains ~78 GB/s on this chip, but the batch-1 inference chain was
measured at ~23 GB/s effective weight streaming): for each batch-1 stage of
the zero-shot pipeline, count the parameter bytes the stage must touch and
time one dispatch (sustained, queued), giving the implied streaming
bandwidth and the gap to the 78 GB/s floor. The per-stage table goes into
benchmarks/README.md.

Run on the chip: python scripts/profile_batch1_roofline.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig
from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic

DTYPE = jnp.bfloat16
BYTES = 2  # bf16 serving weights


def nbytes(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree)) * BYTES


def timeit(fn, n=20):
    _ = np.asarray(jax.tree_util.tree_leaves(fn())[0])
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    _ = np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / n


def main():
    rng = jax.random.PRNGKey(0)
    rows = []

    # --- t2s main encoder forward (1 of 16 sampler iterations) -------------
    t2s_cfg = T2SConfig(hidden_size=384, main_encoder_num_layers=12,
                        main_encoder_num_heads=8, main_encoder_dim_head=24,
                        length_predictor_num_heads=8,
                        length_predictor_dim_head=24)
    t2s = TextToSemantic(t2s_cfg, dtype=DTYPE)
    t2s_params = jax.jit(
        lambda r: t2s.init(
            r, jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool),
            jnp.zeros((1, 16), bool), jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1, 4), bool), jnp.ones((1,)), mask_rng=r, train=False,
        )
    )(rng)
    canvas = jax.random.randint(rng, (1, 608), 0, 1285)  # ~10 s + text

    t2s_fwd = jax.jit(lambda p, ids: t2s.apply(
        p, t2s.bind(p).embed(ids), None,
        method=TextToSemantic.embeddings_to_logits))
    p_sub = {"params": {k: v for k, v in t2s_params["params"].items()
                        if k in ("conformer", "input_embedding", "pred_dense",
                                 "pred_norm", "pred_head")}}
    ms = timeit(lambda: t2s_fwd(t2s_params, canvas)) * 1e3
    wb = nbytes(p_sub)
    rows.append(("t2s fwd (1 iter, d384 12L, T608)", wb, ms))

    # --- s2a stages --------------------------------------------------------
    codec_cfg = CodecConfig()
    s2a_cfg = S2AConfig(codec=codec_cfg)
    s2a = InjectionConformer(s2a_cfg, dtype=DTYPE)
    s2a_params = jax.jit(
        lambda r: s2a.init(r, jnp.zeros((1, 12, 8), jnp.int32),
                           jnp.zeros((1, 8), jnp.int32), mask_rng=r,
                           train=False)
    )(rng)
    codec = Codec(codec_cfg, dtype=DTYPE)
    codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 320, 1)))
    s2a_params = {"params": {**s2a_params["params"],
                             "codec": codec_params["params"]}}

    x = jax.random.normal(rng, (1, 650, 1024), DTYPE)  # prompt 150 + 500

    first = jax.jit(lambda p, x: s2a.apply(
        p, x, method=InjectionConformer.forward_first_level))
    blocks_first = {f"block_{i}" for i in range(5)}  # layers 0..4 incl. tap
    p_first = {"params": {k: v for k, v in s2a_params["params"].items()
                          if k in blocks_first
                          or k in ("logits_norm",)}}
    wb = nbytes(p_first) + s2a_params["params"]["logits_w"][0].size * BYTES
    ms = timeit(lambda: first(s2a_params, x)) * 1e3
    rows.append(("s2a first-level pass (5 of 16 blocks, T650)", wb, ms))

    full = jax.jit(lambda p, x: s2a.apply(
        p, x, method=InjectionConformer.forward_logits))
    p_full = {"params": {k: v for k, v in s2a_params["params"].items()
                         if k.startswith("block_")
                         or k.startswith("project_injection")
                         or k in ("fine_head", "logits_norm", "logits_w",
                                  "logits_b", "acoustic_feat_proj")}}
    # + the codec quantizer tables touched by dynamic injection
    wb = nbytes(p_full) + nbytes(s2a_params["params"]["codec"]["quantizer"])
    ms = timeit(lambda: full(s2a_params, x)) * 1e3
    rows.append(("s2a full pass (16 blocks + heads, T650)", wb, ms))

    codes = jax.random.randint(rng, (1, 12, 500), 0, 1024)
    dec = jax.jit(lambda p, c: codec.apply(
        p, c, method=Codec.decode_from_codes))
    wb = nbytes(codec_params["params"]["decoder"]) + nbytes(
        codec_params["params"]["quantizer"])
    ms = timeit(lambda: dec(codec_params, codes)) * 1e3
    rows.append(("codec decode (T500 -> 10 s audio)", wb, ms))

    print(f"\n{'stage':<46} {'weights':>9} {'ms':>7} {'GB/s':>7} "
          f"{'vs 78 GB/s':>10}")
    for name, wb, ms in rows:
        gbs = wb / (ms * 1e-3) / 1e9
        print(f"{name:<46} {wb / 1e6:>7.1f}MB {ms:>7.2f} {gbs:>7.1f} "
              f"{gbs / 78:>9.0%}")


if __name__ == "__main__":
    main()
