"""Quantization accuracy characterization at FULL model size (VERDICT r3 #2).

The serving layer ships ``--quantize_s2a w8a8`` (-25% batch-1 s2a latency,
benchmarks/README.md); this script bounds what that costs in output quality,
on the real chip, at the real model sizes. The yardstick throughout is the
numeric noise the *reference itself* accepts: it runs inference under bf16
autocast (/root/reference/inference.py:33), so the bf16-vs-f32 delta of the
SAME weights is the reference-sanctioned noise floor. Three measurements:

1. Per-forward logit error (mean/max abs, plus argmax agreement) on the same
   inputs — the quantity quantization directly controls.
2. Token-trajectory agreement through the REAL samplers (greedy and sampled,
   identical PRNG keys): quant-vs-bf16 side by side with bf16-vs-f32. With
   any nonzero perturbation, near-tie decisions flip and compound over
   MaskGIT iterations, so the bf16-vs-f32 column calibrates how much of the
   disagreement is trajectory chaos rather than quantization bias.
3. Output mel distance: both token streams decoded by the SAME bf16 codec,
   multi-scale mel L1 between the audios (the reference's own recon metric,
   dac_loss.py:207-292) — again quant-vs-bf16 alongside bf16-vs-f32.

Weights are random full-size inits (no trained checkpoints exist in this
environment); at d=1024/d=384 full depth the logit gaps are real numbers,
not tiny-model near-ties. Results table: benchmarks/README.md, and the
CPU-testable per-forward bounds are pinned in tests/test_quant_accuracy.py.

Run on the real chip: python scripts/quant_accuracy.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.quantize import quantize_s2a, quantize_t2s
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig, s2a_sample
from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic, t2s_sample

codec_cfg = CodecConfig()
s2a_cfg = S2AConfig(codec=codec_cfg)
t2s_cfg = T2SConfig(hidden_size=384, main_encoder_num_layers=12,
                    main_encoder_num_heads=8, main_encoder_dim_head=24,
                    length_predictor_num_heads=8, length_predictor_dim_head=24)
rng = jax.random.PRNGKey(0)

# One f32 param tree per model; dtype only changes compute precision, so the
# bf16 / f32 / quantized variants all share identical weights.
s2a16 = InjectionConformer(s2a_cfg, dtype=jnp.bfloat16)
s2a32 = InjectionConformer(s2a_cfg, dtype=jnp.float32)
t2s16 = TextToSemantic(t2s_cfg, dtype=jnp.bfloat16)
t2s32 = TextToSemantic(t2s_cfg, dtype=jnp.float32)
s2a_params = jax.jit(
    lambda r: s2a16.init(r, jnp.zeros((1, 12, 8), jnp.int32),
                         jnp.zeros((1, 8), jnp.int32), mask_rng=r, train=False)
)(rng)
codec = Codec(codec_cfg, dtype=jnp.bfloat16)
codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 320, 1)))
s2a_params = {"params": {**s2a_params["params"], "codec": codec_params["params"]}}
t2s_params = jax.jit(
    lambda r: t2s16.init(
        r, jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool),
        jnp.zeros((1, 16), bool), jnp.zeros((1, 4), jnp.int32),
        jnp.ones((1, 4), bool), jnp.ones((1,)), mask_rng=r, train=False,
    )
)(rng)

s2a_i8, s2a_i8p = quantize_s2a(s2a16, s2a_params)
t2s_i8, t2s_i8p = quantize_t2s(t2s16, t2s_params)
s2a_w8, s2a_w8p = quantize_s2a(s2a16, s2a_params, mode="w8a8")
t2s_w8, t2s_w8p = quantize_t2s(t2s16, t2s_params, mode="w8a8")

T_SEM = 500            # 10 s utterance @ 50 Hz
key_in = jax.random.PRNGKey(7)
text = jax.random.randint(key_in, (1, 96), 5, 261)
text_len = jnp.array([96])
gt_len = jnp.array([T_SEM])
key_sample = jax.random.PRNGKey(11)


# -- 1. per-forward logit error -------------------------------------------

def t2s_logits(model, params):
    tok = jax.random.randint(jax.random.PRNGKey(3), (1, 128), 0, 1285)
    emb = model.apply(params, tok, method=TextToSemantic.embed)
    att = jnp.ones(tok.shape, bool)
    return np.asarray(
        model.apply(params, emb, att, conv_pad_mask=att,
                    method=TextToSemantic.embeddings_to_logits),
        np.float32)


def s2a_logits(model, params):
    sem = jax.random.randint(jax.random.PRNGKey(3), (1, 128), 0, 1024)
    enc = model.apply(params, sem, method=InjectionConformer.embed_semantic)
    enc = enc + model.apply(params, method=InjectionConformer.mask_token_value)
    return np.asarray(
        model.apply(params, enc, method=InjectionConformer.forward_first_level),
        np.float32)


def fwd_row(name, fn, variants):
    ref = fn(*variants["bf16"])
    out = {}
    for k, (m, p) in variants.items():
        if k == "bf16":
            continue
        lg = fn(m, p)
        d = np.abs(lg - ref)
        agree = float((lg.argmax(-1) == ref.argmax(-1)).mean())
        out[k] = (float(d.mean()), float(d.max()), agree)
    print(f"[forward] {name}:")
    for k, (dm, dx, ag) in out.items():
        print(f"  {k:8s} vs bf16: mean|d|={dm:.4e} max|d|={dx:.4e} "
              f"argmax agree={ag*100:.2f}%")
    return out


fwd_row("t2s", lambda m, p: t2s_logits(m, p), {
    "bf16": (t2s16, t2s_params), "f32": (t2s32, t2s_params),
    "int8": (t2s_i8, t2s_i8p), "w8a8": (t2s_w8, t2s_w8p)})
fwd_row("s2a", lambda m, p: s2a_logits(m, p), {
    "bf16": (s2a16, s2a_params), "f32": (s2a32, s2a_params),
    "int8": (s2a_i8, s2a_i8p), "w8a8": (s2a_w8, s2a_w8p)})


# -- 2. sampler trajectory agreement ---------------------------------------

def run_t2s(model, params, greedy):
    out = jax.jit(
        lambda p: t2s_sample(model, p, text, text_len, key_sample,
                             max_speech_len=T_SEM, gt_length=gt_len,
                             greedy=greedy),
        static_argnames=())(params)
    return np.asarray(out["semantic_tokens"][0, :T_SEM])


def run_s2a(model, params, sem_tokens, greedy):
    codes = jax.jit(
        lambda p, s: s2a_sample(model, p, s, None, None, key_sample,
                                greedy=greedy)
    )(params, sem_tokens)
    return np.asarray(codes[0])  # (Q, T)


results = {}
for greedy in (True, False):
    mode = "greedy" if greedy else "sampled"
    sem_ref = run_t2s(t2s16, t2s_params, greedy)
    sem_tok = jnp.asarray(sem_ref)[None]
    codes_ref = run_s2a(s2a16, s2a_params, sem_tok, greedy)
    for name, (tm, tp), (sm, sp) in (
        ("f32", (t2s32, t2s_params), (s2a32, s2a_params)),
        ("int8", (t2s_i8, t2s_i8p), (s2a_i8, s2a_i8p)),
        ("w8a8", (t2s_w8, t2s_w8p), (s2a_w8, s2a_w8p)),
    ):
        sem_v = run_t2s(tm, tp, greedy)
        # s2a fed the SAME bf16 semantic stream -> isolates the s2a effect
        codes_v = run_s2a(sm, sp, sem_tok, greedy)
        t_agree = float((sem_v == sem_ref).mean())
        s_agree = float((codes_v == codes_ref).mean())
        results[(mode, name)] = (t_agree, s_agree, codes_v)
        print(f"[sampler {mode}] {name:5s} vs bf16: "
              f"t2s token agree={t_agree*100:.2f}%  "
              f"s2a code agree={s_agree*100:.2f}%")
    results[(mode, "ref")] = codes_ref


# -- 3. output mel distance -------------------------------------------------

from edm_tts_tpu.models.codec.losses import multi_scale_mel_loss

decode = jax.jit(lambda c: codec.apply(
    codec_params, c, method=Codec.decode_from_codes))


def mel(a, b):
    return float(jax.jit(
        lambda x, y: multi_scale_mel_loss(
            x, y, sample_rate=codec_cfg.sample_rate))(a, b))


for mode in ("greedy", "sampled"):
    ref_audio = decode(jnp.asarray(results[(mode, "ref")])[None])
    for name in ("f32", "int8", "w8a8"):
        audio = decode(jnp.asarray(results[(mode, name)][2])[None])
        print(f"[mel {mode}] {name:5s} vs bf16 tokens: "
              f"multi-scale mel L1 = {mel(audio, ref_audio):.4f}")
