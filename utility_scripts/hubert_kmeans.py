"""HuBERT feature dump + k-means semantic codebook creation.

TPU re-design of the reference
(/root/reference/utility_scripts/hubert_kmeans/dump_features_and_kmeans.py):
stream LibriSpeech train-clean-100 through the JAX HuBERT, collect layer-18
frames up to ``1000 * K`` (1.024M for K=1024), then run jitted Lloyd's
k-means (K=1024, niter=20, nredo=5, seed 42 — faiss-parity hyperparams) on
device and export the centroid matrix into the semantic-tokenizer model dir.

Usage:
  python utility_scripts/hubert_kmeans.py --data_dir ... --hubert_model ... \
      --output exp/edm_tts/hubert_semantic
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable as a bare CLI from anywhere: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from edm_tts_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # EDM_PLATFORM=cpu overrides the axon plugin
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--subset", default="train-clean-100")
    ap.add_argument("--hubert_model", required=True,
                    help="exported hubert model dir (see convert_hubert.py)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--frames_per_cluster", type=int, default=1000)
    ap.add_argument("--niter", type=int, default=20)
    ap.add_argument("--nredo", type=int, default=5)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--output_layer", type=int, default=18)
    ap.add_argument("--max_seconds", type=float, default=30.0)
    args = ap.parse_args()

    from edm_tts_tpu.data.manifests import librispeech_manifest
    from edm_tts_tpu.data.pipeline import load_audio_segments
    from edm_tts_tpu.models.hubert.model import normalize_input
    from edm_tts_tpu.ops.kmeans import kmeans
    from edm_tts_tpu.utils.hub import load_semantic_tokenizer, save_hubert

    tok, params = load_semantic_tokenizer(args.hubert_model,
                                          output_layer=args.output_layer)
    # tok clamps output_layer to the model depth (tiny rehearsal exports
    # have < 18 layers); use the clamped value everywhere below
    output_layer = tok.output_layer

    target = args.k * args.frames_per_cluster
    feats: list[np.ndarray] = []
    total = 0

    @jax.jit
    def features(audio):
        x = normalize_input(audio)
        return tok.model.apply(params["hubert"] if "hubert" in params else params,
                               x, output_layer=output_layer)

    max_samples = int(args.max_seconds * 16000)
    for ex in librispeech_manifest(args.data_dir, args.subset):
        for seg in load_audio_segments(ex, 16000, None):
            a = seg["audio"][:max_samples]
            h = np.asarray(features(jnp.asarray(a[None])))[0]
            feats.append(h.astype(np.float32))
            total += h.shape[0]
            break
        if total >= target:
            break
    x = np.concatenate(feats, axis=0)[:target]
    print(f"collected {x.shape[0]} frames of dim {x.shape[1]}")

    centers, inertia = kmeans(
        jnp.asarray(x), args.k, niter=args.niter, nredo=args.nredo, seed=args.seed
    )
    print(f"kmeans done, inertia {float(inertia):.1f}")

    os.makedirs(args.output, exist_ok=True)
    hub_params = params["hubert"] if "hubert" in params else params
    save_hubert(args.output, tok.config, hub_params, np.asarray(centers))
    print(f"exported semantic tokenizer (hubert + {args.k} centroids) to {args.output}")


if __name__ == "__main__":
    main()
