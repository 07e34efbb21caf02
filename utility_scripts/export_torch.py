"""Export a framework-trained model into a reference-compatible torch
checkpoint directory (config.json + model.safetensors).

The reverse of utility_scripts/convert_{dac,t2s,s2a}.py: after training in
this framework, publish weights loadable by the reference classes via
``from_pretrained`` (reference inference.py:27-31) — ``DAC``,
``TextToSemanticWLen``, ``InjectionConformerModel``. State-dict key naming
and tensor layouts are the exact inverses of the import converters (bit-
exact round trip, tests/test_export_torch.py); weight-normed convs use
torch's parametrize naming by default (``--legacy_wn`` for the old
``weight_g/weight_v`` names).

For --stage s2a the embedded frozen codec is additionally exported as an
HF codec dir under ``<output>/acoustic_model`` and ``acoustic_model_path``
in config.json points at it (the reference loads the codec from that path
at model construction, modeling_injection_conformer.py:31).

Usage:
  python utility_scripts/export_torch.py --stage codec \
      --model_dir exp/edm_tts/codec --output exp/export/dac_torch
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable as a bare CLI from anywhere: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import json


def _write(output: str, state: dict, config: dict) -> None:
    os.makedirs(output, exist_ok=True)
    from safetensors.numpy import save_file

    save_file(dict(state), os.path.join(output, "model.safetensors"))
    with open(os.path.join(output, "config.json"), "w") as f:
        json.dump(config, f, indent=2, sort_keys=True)


def _cfg_dict(cfg, model_type: str) -> dict:
    d = {
        k: (list(v) if isinstance(v, tuple) else v)
        for k, v in dataclasses.asdict(cfg).items()
    }
    d["model_type"] = model_type
    return d


def export_codec(model_dir: str, output: str, legacy_wn: bool) -> None:
    from edm_tts_tpu.models.codec.convert import to_torch_state_dict
    from edm_tts_tpu.utils.hub import load_codec

    codec, params = load_codec(model_dir)
    state = to_torch_state_dict(codec.config, params, legacy_wn=legacy_wn)
    _write(output, state, _cfg_dict(codec.config, "dac"))


def export_t2s(model_dir: str, output: str) -> None:
    from edm_tts_tpu.models.t2s.convert import to_torch_state_dict
    from edm_tts_tpu.utils.hub import load_t2s

    model, params = load_t2s(model_dir)
    state = to_torch_state_dict(model.cfg, params)
    _write(output, state, _cfg_dict(model.cfg, "text_to_semantic_w_length"))


def export_s2a(model_dir: str, output: str, legacy_wn: bool) -> None:
    from edm_tts_tpu.models.codec.convert import (
        to_torch_state_dict as codec_to_torch,
    )
    from edm_tts_tpu.models.s2a.convert import to_torch_state_dict
    from edm_tts_tpu.utils.hub import load_s2a

    model, params = load_s2a(model_dir)
    state = to_torch_state_dict(model.cfg, params)
    # the reference re-loads the frozen codec from acoustic_model_path at
    # construction; ship it alongside so the checkpoint is self-contained
    codec_dir = os.path.join(output, "acoustic_model")
    codec_state = codec_to_torch(
        model.cfg.codec, {"params": params["params"]["codec"]}, legacy_wn=legacy_wn
    )
    _write(codec_dir, codec_state, _cfg_dict(model.cfg.codec, "dac"))
    cfg = _cfg_dict(model.cfg, "injection_conformer")
    cfg.pop("codec", None)
    cfg["acoustic_model_path"] = codec_dir
    _write(output, state, cfg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True, choices=("codec", "t2s", "s2a"))
    ap.add_argument("--model_dir", required=True, help="framework model dir")
    ap.add_argument("--output", required=True, help="torch checkpoint dir")
    ap.add_argument("--legacy_wn", action="store_true")
    args = ap.parse_args()

    if args.stage == "codec":
        export_codec(args.model_dir, args.output, args.legacy_wn)
    elif args.stage == "t2s":
        export_t2s(args.model_dir, args.output)
    else:
        export_s2a(args.model_dir, args.output, args.legacy_wn)
    print(f"exported {args.stage} -> {args.output}")


if __name__ == "__main__":
    main()
