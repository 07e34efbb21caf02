"""MaskGIT sampler speed: our jitted lax.scan vs the reference torch loop,
same machine, CPU vs CPU, equal NFE — an honest lower-bound stand-in for the
BASELINE ">=10x faster at equal NFE" target (the reference's GPU is not
available here; the TPU absolute numbers live in benchmarks/README.md).

Builds the SAME tiny config in both frameworks (random weights — sampler
speed is architecture+loop-bound, not weight-bound), runs the t2s ``infer``
(16 iters) and s2a ``infer_special`` (8 steps + full pass) surfaces, and
reports wall-clock ratios after warmup. torch gets its normal
threaded-CPU execution; ours is the jitted sampler excluding compile.

Usage: JAX_PLATFORMS=cpu python scripts/maskgit_speed_vs_torch.py
"""

import importlib.machinery
import sys
import tempfile
import time
import types

sys.path.insert(0, ".")

# force CPU before jax initializes (fair same-device comparison)
import jax

jax.config.update("jax_platforms", "cpu")

for name in ("torchaudio", "torchaudio.functional"):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = mod
sys.modules["torchaudio"].functional = sys.modules["torchaudio.functional"]
sys.path.insert(0, "/root/reference")

import jax.numpy as jnp
import numpy as np
import torch

from edm_tts_tpu.models.codec import CodecConfig
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig, s2a_sample
from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic, t2s_sample

HID, DEPTH, HEADS = 256, 6, 8
SEM_V, TXT_V = 1024, 256
SPEECH_LEN, TEXT = 256, "the quick brown fox jumps over the lazy dog"
Q, NCODE = 12, 1024


def _timeit(fn, n=3):
    fn()  # warmup (jit compile / torch lazy init)
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def bench_t2s():
    from edm_tts.models.text_to_semantic.configuration import (
        TextToSemanticWLenConfig,
    )
    from edm_tts.models.text_to_semantic.modeling_text_to_semantic import (
        TextToSemanticWLen,
    )

    torch.manual_seed(0)
    ref = TextToSemanticWLen(
        TextToSemanticWLenConfig(
            hidden_size=HID, semantic_vocab_size=SEM_V, text_vocab_size=TXT_V,
            main_encoder_num_heads=HEADS, main_encoder_num_layers=DEPTH,
            length_predictor_num_layers=2, attn_flash=False,
        )
    ).eval()

    def run_ref():
        with torch.no_grad():
            ref.infer(TEXT, pred_iters=16, gt_length=torch.tensor([SPEECH_LEN]))

    t_ref = _timeit(run_ref)

    cfg = T2SConfig(
        hidden_size=HID, semantic_vocab_size=SEM_V, text_vocab_size=TXT_V,
        main_encoder_num_heads=HEADS, main_encoder_num_layers=DEPTH,
        length_predictor_num_layers=2,
    )
    model = TextToSemantic(cfg)
    text = jnp.asarray([[c + 5 for c in TEXT.encode()]], jnp.int32)
    tl = jnp.asarray([text.shape[1]], jnp.int32)
    params = jax.jit(
        lambda r: model.init(
            r, jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), bool),
            jnp.zeros((1, 8), bool), jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1, 4), bool), jnp.ones((1,)), mask_rng=r, train=False,
        )
    )(jax.random.PRNGKey(0))
    gt = jnp.asarray([SPEECH_LEN], jnp.int32)

    def run_ours():
        out = t2s_sample(
            model, params, text, tl, jax.random.PRNGKey(1), pred_iters=16,
            max_speech_len=SPEECH_LEN, gt_length=gt,
        )
        jax.block_until_ready(out["semantic_tokens"])

    t_ours = _timeit(run_ours)
    return t_ref, t_ours


def bench_s2a():
    from edm_tts.models.dac.configuration import DACConfig
    from edm_tts.models.dac.modeling_dac import DAC
    from edm_tts.models.injection_conformer.configuration import (
        InjectionConformerConfig,
    )
    from edm_tts.models.injection_conformer.modeling_injection_conformer import (
        InjectionConformerModel,
    )

    torch.manual_seed(1)
    dac_cfg = dict(encoder_dim=8, encoder_rates=[2, 4, 5, 8], decoder_dim=96,
                   decoder_rates=[8, 5, 4, 2], n_codebooks=Q,
                   codebook_size=NCODE, codebook_dim=8, quantizer_dropout=0.0)
    dac = DAC(DACConfig(**dac_cfg))
    tmp = tempfile.mkdtemp()
    dac.save_pretrained(tmp)
    ref = InjectionConformerModel(
        InjectionConformerConfig(
            hidden_size=HID, num_semantic_tokens=SEM_V, acoustic_model_path=tmp,
            encoder_num_heads=HEADS, encoder_num_layers=DEPTH,
            encoder_attn_dropout=0.0, encoder_ff_dropout=0.0,
            encoder_conv_dropout=0.0, injection_layers=(1, 2, 3, 4),
            attn_flash=False,
        )
    ).eval()

    rng = np.random.default_rng(0)
    sem = torch.from_numpy(rng.integers(0, SEM_V, (1, SPEECH_LEN)))
    acp = torch.from_numpy(rng.integers(0, NCODE, (1, Q, 64)))
    semp = torch.from_numpy(rng.integers(0, SEM_V, (1, 64)))

    def run_ref():
        with torch.no_grad():
            ref.infer_special(sem, acp, semp, steps=8)

    t_ref = _timeit(run_ref)

    cfg = S2AConfig(
        hidden_size=HID, num_semantic_tokens=SEM_V, encoder_num_heads=HEADS,
        encoder_num_layers=DEPTH, injection_layers=(1, 2, 3, 4),
        encoder_attn_dropout=0.0, encoder_ff_dropout=0.0,
        encoder_conv_dropout=0.0,
        codec=CodecConfig(encoder_dim=8, decoder_dim=96, n_codebooks=Q,
                          codebook_size=NCODE, codebook_dim=8,
                          quantizer_dropout=0.0),
    )
    model = InjectionConformer(cfg)
    params = jax.jit(
        lambda r: model.init(
            r, jnp.zeros((1, Q, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32),
            mask_rng=r, train=False,
        )
    )(jax.random.PRNGKey(0))
    sem_j = jnp.asarray(sem.numpy(), jnp.int32)
    acp_j = jnp.asarray(acp.numpy(), jnp.int32)
    semp_j = jnp.asarray(semp.numpy(), jnp.int32)

    def run_ours():
        codes = s2a_sample(model, params, sem_j, acp_j, semp_j,
                           jax.random.PRNGKey(2), steps=8)
        jax.block_until_ready(codes)

    t_ours = _timeit(run_ours)
    return t_ref, t_ours


def main():
    torch.set_num_threads(torch.get_num_threads())  # torch default threading
    rows = []
    for name, fn in [("t2s infer (16 iters)", bench_t2s),
                     ("s2a infer_special (8+1)", bench_s2a)]:
        t_ref, t_ours = fn()
        rows.append((name, t_ref, t_ours, t_ref / t_ours))
        print(f"{name}: torch {t_ref * 1e3:.0f} ms | ours {t_ours * 1e3:.0f} ms "
              f"| {t_ref / t_ours:.1f}x", flush=True)
    print("\n| surface | torch CPU | ours (jit, CPU) | speedup |")
    print("|---|---|---|---|")
    for name, tr, to, r in rows:
        print(f"| {name} | {tr * 1e3:.0f} ms | {to * 1e3:.0f} ms | {r:.1f}x |")


if __name__ == "__main__":
    main()
