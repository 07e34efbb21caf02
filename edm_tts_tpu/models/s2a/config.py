"""Semantic->acoustic (injection Conformer) configuration.

Field parity with the reference InjectionConformerConfig
(/root/reference/edm_tts/models/injection_conformer/configuration.py:4-66):
d=1024, 16 layers, 16 heads, ff_mult 4, conv k5, injections at (4,7,10,13),
residual + use_injection on, loss on masked positions only.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

from edm_tts_tpu.models.codec.config import CodecConfig
from edm_tts_tpu.models.conformer.conformer import ConformerConfig


@dataclasses.dataclass(frozen=True)
class S2AConfig:
    hidden_size: int = 1024
    num_semantic_tokens: int = 1024
    encoder_num_heads: int = 16
    encoder_num_layers: int = 16
    encoder_ff_mult: int = 4
    encoder_conv_kernel_size: int = 5
    encoder_attn_dropout: float = 0.1
    encoder_ff_dropout: float = 0.1
    encoder_conv_dropout: float = 0.1
    injection_layers: Tuple[int, ...] = (4, 7, 10, 13)
    residual: bool = True
    use_injection: bool = True
    loss_all: bool = False
    gradient_checkpointing: bool = False
    # "mha" saves only the attention-kernel output (+0.8 GB total at batch
    # 32 x 768) so the backward skips the most expensive recompute; "dots"
    # (save matmul outputs) OOMs 16G HBM at this scale (measured 18.4G).
    remat_policy: str = "mha"
    # "auto" | "xla" | "pallas" | "ring" (sequence-parallel attention over
    # the ambient mesh's `sequence` axis; see ops/ring_attention.py)
    attn_implementation: str = "auto"
    # "none" | "int8": weight-only int8 matmuls for serving (ops/qdense.py;
    # params converted offline by models/quantize.py). Inference-only.
    quantize: str = "none"
    codec: CodecConfig = dataclasses.field(default_factory=CodecConfig)

    @property
    def encoder_config(self) -> ConformerConfig:
        return ConformerConfig(
            dim=self.hidden_size,
            depth=self.encoder_num_layers,
            dim_head=self.hidden_size // self.encoder_num_heads,
            heads=self.encoder_num_heads,
            ff_mult=self.encoder_ff_mult,
            conv_kernel_size=self.encoder_conv_kernel_size,
            attn_dropout=self.encoder_attn_dropout,
            ff_dropout=self.encoder_ff_dropout,
            conv_dropout=self.encoder_conv_dropout,
            remat=self.gradient_checkpointing,
            attn_implementation=self.attn_implementation,
            quantize=self.quantize,
        )

    @property
    def num_quantizers(self) -> int:
        return self.codec.n_codebooks

    @property
    def num_codevectors(self) -> int:
        return self.codec.codebook_size

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["model_type"] = "s2a_injection_conformer"
        return json.dumps(d, indent=2)

    @classmethod
    def from_dict(cls, d: dict) -> "S2AConfig":
        d = dict(d)
        codec = d.pop("codec", None)
        d = {k: v for k, v in d.items() if k in {f.name for f in dataclasses.fields(cls)}}
        if "injection_layers" in d:
            d["injection_layers"] = tuple(d["injection_layers"])
        if codec is not None:
            d["codec"] = CodecConfig.from_dict(codec)
        return cls(**d)

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "config.json"), "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "S2AConfig":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_dict(json.load(f))


if __name__ == "__main__":
    # regenerate the checked-in base config artifact, mirroring the reference
    # configuration.py __main__ block (injection_conformer/configuration.py:69-71)
    _root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    S2AConfig().save(os.path.join(
        _root, "configs", "injection_conformer", "base_config"))
