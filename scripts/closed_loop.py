"""Closed-loop pipeline rehearsal: the reference's FULL README workflow
(/root/reference/README.md:22-101) end-to-end on this framework, through
the REAL CLIs, tiny-but-real sizes (VERDICT r4 #2):

  1. synthesize a LibriSpeech-layout FLAC dataset (+ transcripts)
  2. run_codec_training.py       — GAN-train a tiny codec -> best_model
  3. utility_scripts/hubert_kmeans.py — k-means centroids from a (random
     tiny) HuBERT; the reference starts from pretrained facebook/
     hubert-large-ll60k, so HuBERT weights themselves are out of scope
  4. utility_scripts/dump_tokens.py   — dump aligned token shards with the
     SELF-TRAINED codec + the k-means semantic tokenizer
  5. run_text_to_semantic_training.py — train t2s on the dumps -> export
  6. run_semantic_to_acoustic_training.py — train s2a on the dumps -> export
  7. inference.py — synthesize a wav from text + a speaker prompt with the
     three self-trained artifacts

No torch anywhere; every stage is the same CLI a user would run. Each
stage is a subprocess, stdout/stderr teed to <root>/logs/.

Usage:
  EDM_PLATFORM=cpu python scripts/closed_loop.py --root /tmp/closed_loop
  (or run on the chip by omitting EDM_PLATFORM)
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np

SR = 16000
WORDS = [
    "".join(chr(97 + (i * 5 + j * 11) % 26) for j in range(3 + (i * 7) % 5))
    for i in range(48)
]


def make_dataset(root: str, n_speakers=3, n_utts=20, seed=0):
    """LibriSpeech-layout FLACs (harmonics + AM + noise, 'speech-shaped')
    with transcript files (librispeech_manifest glob:
    <root>/LibriSpeech/<split>/<spk>/<chap>/*.trans.txt)."""
    from flac_encoder import encode_flac

    rng = np.random.default_rng(seed)
    split = os.path.join(root, "LibriSpeech", "train-clean-100")
    n = 0
    for spk in range(n_speakers):
        chap_dir = os.path.join(split, str(100 + spk), "1")
        os.makedirs(chap_dir, exist_ok=True)
        lines = []
        for u in range(n_utts):
            dur = float(rng.uniform(3.2, 4.0))
            t = np.arange(int(dur * SR)) / SR
            f0 = float(rng.uniform(90, 300))
            sig = np.zeros_like(t, dtype=np.float64)
            for h in range(1, 6):
                sig += (0.4 / h) * np.sin(
                    2 * np.pi * h * f0 * t + rng.uniform(0, 2 * np.pi)
                )
            env = 0.55 + 0.45 * np.sin(2 * np.pi * rng.uniform(1.5, 5.0) * t)
            sig = sig * env + 0.01 * rng.standard_normal(t.shape)
            sig = 0.7 * sig / (np.abs(sig).max() + 1e-9)
            ints = np.clip(sig * 32767, -32768, 32767).astype(np.int64)
            utt_id = f"{100 + spk}-1-{u:04d}"
            with open(os.path.join(chap_dir, utt_id + ".flac"), "wb") as f:
                f.write(encode_flac(ints[None], sample_rate=SR,
                                    subframe_kind="fixed", order=2, param=12))
            text = " ".join(
                WORDS[j] for j in rng.integers(0, len(WORDS),
                                               int(rng.integers(6, 12)))
            ).upper()
            lines.append(f"{utt_id} {text}")
            n += 1
        with open(os.path.join(chap_dir, "1.trans.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    print(f"dataset: {n} utterances under {split}")


def make_tiny_hubert(path: str):
    """Random tiny HuBERT export (the frozen external feature extractor —
    reference loads pretrained weights, semantic_tokenizer_hubert.py:23).

    Always on CPU: this is the ORCHESTRATOR's only jax use (a tiny random
    init + export); the stages are subprocesses that pick their own
    platform from $EDM_PLATFORM. Keeping the parent off the chip also
    avoids wedging the axon tunnel while stage subprocesses use it."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from edm_tts_tpu.models.hubert import HubertModel
    from edm_tts_tpu.models.hubert.config import HubertConfig
    from edm_tts_tpu.utils.hub import save_hubert

    cfg = HubertConfig(
        conv_dim=(16,) * 7, conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_stride=(5, 2, 2, 2, 2, 2, 2), hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    )
    params = jax.jit(HubertModel(cfg).init)(
        jax.random.PRNGKey(7), jnp.zeros((1, 1280))
    )
    save_hubert(path, cfg, params)


CODEC_YAML = """\
output_dir: {root}/codec
generator_args:
  encoder_dim: 8
  decoder_dim: 64
  n_codebooks: 4
  codebook_size: 64
  codebook_dim: 4
discriminator_args:
  mpd_periods: [2, 3]
  mrd_fft_sizes: [512, 256]
dataset_args:
  path: librispeech
  name: train-clean-100
  data_dir: {root}/data
training_segment_length: 0.38
validation_segment_length: 2.0
validation_split: 4
shuffle_buffer_size: 64
per_device_train_batch_size: 8
max_steps: {codec_steps}
logging_steps: 25
eval_steps: {codec_eval}
save_steps: {codec_eval}
gen_optimizer_args: {{lr: 2.0e-4, betas: [0.8, 0.99]}}
disc_optimizer_args: {{lr: 2.0e-4, betas: [0.8, 0.99]}}
seed: 42
"""

T2S_YAML = """\
output_dir: {root}/t2s
extra_model_params:
  hidden_size: 64
  semantic_vocab_size: {k}
  main_encoder_num_layers: 2
  main_encoder_num_heads: 4
  length_predictor_num_layers: 1
  length_predictor_num_heads: 4
dataset_args:
  data_dir: {root}/codes
  format: native
seed: 42
per_device_train_batch_size: 8
max_steps: {steps}
learning_rate: 1.0e-3
warmup_steps: 30
logging_steps: 25
eval_steps: 1000000
save_steps: {steps}
bf16: false
"""

S2A_YAML = """\
output_dir: {root}/s2a
acoustic_model_path: {root}/codec/best_model
extra_model_params:
  num_semantic_tokens: {k}
  hidden_size: 64
  injection_layers: [1, 2]
  encoder_config:
    depth: 4
    heads: 4
dataset_args:
  data_dir: {root}/codes
  format: native
training_segment_length: 2.0
seed: 42
per_device_train_batch_size: 8
max_steps: {steps}
learning_rate: 1.0e-3
warmup_steps: 30
logging_steps: 25
eval_steps: 1000000
save_steps: {steps}
bf16: false
"""


def run_stage(name: str, cmd: list[str], root: str,
              done_path: str | None = None) -> float:
    """Run one CLI stage; skip if ``done_path`` already exists (idempotent
    re-runs after a mid-loop failure keep completed stages)."""
    log = os.path.join(root, "logs", name + ".log")
    os.makedirs(os.path.dirname(log), exist_ok=True)
    if done_path and os.path.exists(done_path):
        print(f"--- {name}: SKIP (exists: {done_path})", flush=True)
        return 0.0
    print(f"--- {name}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    with open(log, "w") as f:
        p = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT)
    dt = time.time() - t0
    if p.returncode != 0:
        print(open(log).read()[-3000:])
        raise SystemExit(f"stage {name} FAILED (rc={p.returncode}, {log})")
    print(f"    ok in {dt:.0f}s ({log})", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/closed_loop")
    ap.add_argument("--codec_steps", type=int, default=300)
    ap.add_argument("--token_steps", type=int, default=300)
    ap.add_argument("--k", type=int, default=32)
    args = ap.parse_args()
    root = os.path.abspath(args.root)
    os.makedirs(root, exist_ok=True)
    py = sys.executable
    t_all = time.time()
    timings = {}

    make_dataset(os.path.join(root, "data"))
    make_tiny_hubert(os.path.join(root, "hubert_raw"))

    with open(f"{root}/codec.yaml", "w") as f:
        f.write(CODEC_YAML.format(root=root, codec_steps=args.codec_steps,
                                  codec_eval=max(50, args.codec_steps // 3)))
    timings["codec_gan_training"] = run_stage(
        "1_codec", [py, "run_codec_training.py", f"{root}/codec.yaml"], root,
        done_path=f"{root}/codec/best_model")
    assert os.path.isdir(f"{root}/codec/best_model"), "no best_model export"

    timings["hubert_kmeans"] = run_stage(
        "2_kmeans",
        [py, "utility_scripts/hubert_kmeans.py",
         "--data_dir", f"{root}/data", "--subset", "train-clean-100",
         "--hubert_model", f"{root}/hubert_raw",
         "--output", f"{root}/hubert_semantic",
         "--k", str(args.k), "--frames_per_cluster", "50", "--nredo", "2"],
        root, done_path=f"{root}/hubert_semantic")

    timings["dump_tokens"] = run_stage(
        "3_dump",
        [py, "utility_scripts/dump_tokens.py",
         "--dataset", "librispeech", "--data_dir", f"{root}/data",
         "--subset", "train-clean-100", "--output_dir", f"{root}/codes",
         "--codec_model", f"{root}/codec/best_model",
         "--hubert_model", f"{root}/hubert_semantic",
         "--batch_size", "4", "--dtype", "float32"],
        root, done_path=f"{root}/codes/shard_0_00000.json")

    with open(f"{root}/t2s.yaml", "w") as f:
        f.write(T2S_YAML.format(root=root, k=args.k, steps=args.token_steps))
    timings["t2s_training"] = run_stage(
        "4_t2s", [py, "run_text_to_semantic_training.py", f"{root}/t2s.yaml"],
        root, done_path=f"{root}/t2s/export")
    assert os.path.isdir(f"{root}/t2s/export")

    with open(f"{root}/s2a.yaml", "w") as f:
        f.write(S2A_YAML.format(root=root, k=args.k, steps=args.token_steps))
    timings["s2a_training"] = run_stage(
        "5_s2a",
        [py, "run_semantic_to_acoustic_training.py", f"{root}/s2a.yaml"],
        root, done_path=f"{root}/s2a/export")
    assert os.path.isdir(f"{root}/s2a/export")

    prompt = os.path.join(
        root, "data", "LibriSpeech", "train-clean-100", "100", "1",
        "100-1-0000.flac")
    timings["inference"] = run_stage(
        "6_inference",
        [py, "inference.py", "-s", prompt,
         "-t", "hello closed loop synthesis test.",
         "-o", f"{root}/out.wav",
         "--codec_model", f"{root}/codec/best_model",
         "--t2s_model", f"{root}/t2s/export",
         "--s2a_model", f"{root}/s2a/export",
         "--hubert_model", f"{root}/hubert_semantic",
         "--max_speech_len", "128", "--gt_length", "100",
         "--pred_iters", "4", "--s2a_steps", "4", "--dtype", "float32"],
        root)

    from scipy.io import wavfile

    sr, wav = wavfile.read(f"{root}/out.wav")
    rms = float(np.sqrt(np.mean(wav.astype(np.float64) ** 2)))
    assert sr == SR and wav.shape[0] == 100 * 320 and rms > 0, (sr, wav.shape, rms)
    print(f"\nCLOSED LOOP OK in {time.time() - t_all:.0f}s: "
          f"out.wav {wav.shape[0] / sr:.2f}s rms={rms:.1f}")
    for k, v in timings.items():
        print(f"  {k:22s} {v:7.0f}s")


if __name__ == "__main__":
    main()
