"""Convert a reference (torch) DAC checkpoint into the framework's format.

Offline weight import for the published codec checkpoints
(reference inference.py:27 ``DAC.from_pretrained``): reads
model.safetensors / pytorch_model.bin + config.json from the HF checkpoint
dir, maps the weight-normed torch state dict onto the flax codec tree
(models/codec/convert.py), and exports an orbax model dir loadable by
``utils.hub.load_codec``.

Usage:
  python utility_scripts/convert_dac.py --torch_dir /path/to/dac_checkpoint \
      --output exp/edm_tts/codec
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable as a bare CLI from anywhere: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json


def load_torch_state_dict(torch_dir: str) -> dict:
    st_path = os.path.join(torch_dir, "model.safetensors")
    pt_path = os.path.join(torch_dir, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return load_file(st_path)
    if os.path.exists(pt_path):
        import torch

        sd = torch.load(pt_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no weights found under {torch_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_dir", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from edm_tts_tpu.models.codec import Codec, CodecConfig
    from edm_tts_tpu.models.codec.convert import from_torch_state_dict
    from edm_tts_tpu.utils.hub import save_codec

    with open(os.path.join(args.torch_dir, "config.json")) as f:
        cfg = CodecConfig.from_dict(json.load(f))
    sd = load_torch_state_dict(args.torch_dir)
    variables = from_torch_state_dict(cfg, sd)
    save_codec(args.output, Codec(cfg), variables)
    print(f"saved codec to {args.output} ({cfg})")


if __name__ == "__main__":
    main()
