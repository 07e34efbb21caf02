"""Convert a reference (torch) InjectionConformerModel checkpoint into ours.

Reads model.safetensors / pytorch_model.bin + config.json from the HF
checkpoint dir (reference inference.py:30 ``from_pretrained``), maps the
state dict — including the embedded frozen DAC (``acoustic_model.*``,
modeling_injection_conformer.py:31) — onto the flax tree
(models/s2a/convert.py), and exports an orbax model dir loadable by
``utils.hub.load_s2a``.

The codec config comes from the DAC checkpoint dir referenced by the s2a
config's ``acoustic_model_path`` (override with --codec_dir if the original
path is stale); if the s2a state dict lacks the ``acoustic_model.*`` weights
they are sourced from that same dir.

Usage:
  python utility_scripts/convert_s2a.py --torch_dir /path/to/s2a_checkpoint \
      [--codec_dir /path/to/dac_checkpoint] --output exp/edm_tts/s2a
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable as a bare CLI from anywhere: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json

from convert_dac import load_torch_state_dict


def s2a_config_from_reference_json(d: dict, codec_cfg):
    from edm_tts_tpu.models.s2a import S2AConfig

    enc = d.get("encoder_config", {})
    return S2AConfig(
        hidden_size=d.get("hidden_size", 1024),
        num_semantic_tokens=d.get("num_semantic_tokens", 1024),
        encoder_num_heads=enc.get("heads", 16),
        encoder_num_layers=enc.get("depth", 16),
        encoder_ff_mult=enc.get("ff_mult", 4),
        encoder_conv_kernel_size=enc.get("conv_kernel_size", 5),
        encoder_attn_dropout=enc.get("attn_dropout", 0.1),
        encoder_ff_dropout=enc.get("ff_dropout", 0.1),
        encoder_conv_dropout=enc.get("conv_dropout", 0.1),
        injection_layers=tuple(d.get("injection_layers", (4, 7, 10, 13))),
        residual=d.get("residual", True),
        use_injection=d.get("use_injection", True),
        loss_all=d.get("loss_all", False),
        codec=codec_cfg,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_dir", required=True)
    ap.add_argument("--codec_dir", default=None)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from edm_tts_tpu.models.codec import CodecConfig
    from edm_tts_tpu.models.s2a import InjectionConformer
    from edm_tts_tpu.models.s2a.convert import from_torch_state_dict
    from edm_tts_tpu.utils.hub import save_s2a

    with open(os.path.join(args.torch_dir, "config.json")) as f:
        ref_cfg = json.load(f)
    codec_dir = args.codec_dir or ref_cfg.get("acoustic_model_path")
    with open(os.path.join(codec_dir, "config.json")) as f:
        codec_cfg = CodecConfig.from_dict(json.load(f))
    cfg = s2a_config_from_reference_json(ref_cfg, codec_cfg)

    sd = load_torch_state_dict(args.torch_dir)
    if not any(k.startswith("acoustic_model.") for k in sd):
        dac_sd = load_torch_state_dict(codec_dir)
        sd.update({f"acoustic_model.{k}": v for k, v in dac_sd.items()})
    variables = from_torch_state_dict(cfg, sd)
    save_s2a(args.output, InjectionConformer(cfg), variables)
    print(f"saved s2a to {args.output}")


if __name__ == "__main__":
    main()
