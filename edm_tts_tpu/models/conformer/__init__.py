from edm_tts_tpu.models.conformer.conformer import (
    Attention,
    ChanLayerNorm,
    Conformer,
    ConformerBlock,
    ConformerConfig,
    ConvModule,
    FeedForward,
)
