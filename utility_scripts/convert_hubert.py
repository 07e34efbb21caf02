"""Convert a local HF HuBERT checkpoint (torch) into the framework's format.

Offline weight import for ``facebook/hubert-large-ll60k`` (no network in the
training environment): reads pytorch_model.bin / model.safetensors from a
local HF snapshot, maps to the flax tree (models/hubert/convert.py), and
exports an orbax model dir; optionally bundles k-means centroids (from a
reference ``.pt`` centroid file or an npz).

Usage:
  python utility_scripts/convert_hubert.py --hf_dir /path/to/hubert-large-ll60k \
      --output exp/edm_tts/hubert_semantic [--kmeans centers.pt]
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable as a bare CLI from anywhere: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_hf_state_dict(hf_dir: str) -> dict:
    st_path = os.path.join(hf_dir, "model.safetensors")
    pt_path = os.path.join(hf_dir, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return load_file(st_path)
    if os.path.exists(pt_path):
        import torch

        sd = torch.load(pt_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no weights found under {hf_dir}")


def load_centroids(path: str):
    import numpy as np

    if path.endswith(".pt"):
        import torch

        return np.asarray(torch.load(path, map_location="cpu"))
    if path.endswith(".npz"):
        import numpy as np

        blob = np.load(path)
        return blob[list(blob.keys())[0]]
    import numpy as np

    return np.load(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hf_dir", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--kmeans", default=None)
    args = ap.parse_args()

    import json

    from edm_tts_tpu.models.hubert import HubertConfig, from_hf_state_dict
    from edm_tts_tpu.utils.hub import save_hubert

    with open(os.path.join(args.hf_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = HubertConfig(
        conv_dim=tuple(hf_cfg["conv_dim"]),
        conv_kernel=tuple(hf_cfg["conv_kernel"]),
        conv_stride=tuple(hf_cfg["conv_stride"]),
        conv_bias=hf_cfg.get("conv_bias", True),
        feat_extract_norm=hf_cfg.get("feat_extract_norm", "layer"),
        hidden_size=hf_cfg["hidden_size"],
        num_hidden_layers=hf_cfg["num_hidden_layers"],
        num_attention_heads=hf_cfg["num_attention_heads"],
        intermediate_size=hf_cfg["intermediate_size"],
        layer_norm_eps=hf_cfg.get("layer_norm_eps", 1e-5),
        num_conv_pos_embeddings=hf_cfg.get("num_conv_pos_embeddings", 128),
        num_conv_pos_embedding_groups=hf_cfg.get("num_conv_pos_embedding_groups", 16),
        do_stable_layer_norm=hf_cfg.get("do_stable_layer_norm", True),
    )
    sd = load_hf_state_dict(args.hf_dir)
    sd = {k.removeprefix("hubert."): v for k, v in sd.items()}
    params = from_hf_state_dict(cfg, sd)
    centers = load_centroids(args.kmeans) if args.kmeans else None
    save_hubert(args.output, cfg, params, centers)
    print(f"exported hubert ({cfg.num_hidden_layers} layers) to {args.output}")


if __name__ == "__main__":
    main()
