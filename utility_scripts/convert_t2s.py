"""Convert a reference (torch) TextToSemanticWLen checkpoint into our format.

Reads model.safetensors / pytorch_model.bin + config.json from the HF
checkpoint dir (reference inference.py:31 ``from_pretrained``), maps the
state dict onto the flax tree (models/t2s/convert.py), and exports an orbax
model dir loadable by ``utils.hub.load_t2s``.

The reference config stores the encoder hyperparameters inside
``main_encoder_args``/``length_predictor_args`` dicts — including the
already-quirky ``dim_head`` (configuration.py:85-86 derives it from the
CONSTRUCTOR default heads, not a yaml ``heads`` override), which we trust
verbatim so converted checkpoints reproduce the published recipe exactly.

Usage:
  python utility_scripts/convert_t2s.py --torch_dir /path/to/t2s_checkpoint \
      --output exp/edm_tts/t2s
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable as a bare CLI from anywhere: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json

from convert_dac import load_torch_state_dict


def t2s_config_from_reference_json(d: dict):
    from edm_tts_tpu.models.t2s import T2SConfig

    main = d.get("main_encoder_args", {})
    lp = d.get("length_predictor_args", {})
    hidden = d.get("hidden_size", 512)
    return T2SConfig(
        hidden_size=hidden,
        semantic_vocab_size=d.get("semantic_vocab_size", 1024),
        text_vocab_size=d.get("text_vocab_size", 256),
        main_encoder_num_heads=main.get("heads", 16),
        main_encoder_dim_head=main.get("dim_head"),
        main_encoder_num_layers=main.get("depth", 8),
        main_encoder_ff_mult=main.get("ff_mult", 4),
        main_encoder_conv_kernel_size=main.get("conv_kernel_size", 5),
        main_encoder_attn_dropout=main.get("attn_dropout", 0.0),
        main_encoder_ff_dropout=main.get("ff_dropout", 0.0),
        main_encoder_conv_dropout=main.get("conv_dropout", 0.0),
        length_predictor_num_heads=lp.get("heads", 16),
        length_predictor_dim_head=lp.get("dim_head"),
        length_predictor_num_layers=lp.get("depth", 4),
        length_predictor_ff_mult=lp.get("ff_mult", 4),
        length_predictor_conv_kernel_size=lp.get("conv_kernel_size", 5),
        length_predictor_attn_dropout=lp.get("attn_dropout", 0.0),
        length_predictor_ff_dropout=lp.get("ff_dropout", 0.0),
        length_predictor_conv_dropout=lp.get("conv_dropout", 0.0),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_dir", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from edm_tts_tpu.models.t2s import TextToSemantic
    from edm_tts_tpu.models.t2s.convert import from_torch_state_dict
    from edm_tts_tpu.utils.hub import save_t2s

    with open(os.path.join(args.torch_dir, "config.json")) as f:
        cfg = t2s_config_from_reference_json(json.load(f))
    sd = load_torch_state_dict(args.torch_dir)
    variables = from_torch_state_dict(cfg, sd)
    save_t2s(args.output, TextToSemantic(cfg), variables)
    print(f"saved t2s to {args.output}")


if __name__ == "__main__":
    main()
