"""EDM-TTS-TPU: a TPU-native (JAX/XLA/Pallas/pjit) zero-shot text-to-speech framework.

A from-scratch rebuild of the capabilities of the EDM-TTS reference
(three-stage pipeline: DAC-style neural codec with 12-level RVQ at 16 kHz,
non-autoregressive text->semantic Conformer with length prediction, and an
injection-Conformer semantic->acoustic model; both generative stages use
MaskGIT-style confidence-based iterative parallel decoding), re-designed
TPU-first:

- pure-function flax models, explicit PRNG threading
- static-shape jitted train & sample steps
- MaskGIT samplers as jit'd ``lax.scan`` over the cosine mask schedule
- sharding via ``jax.sharding.Mesh`` + pjit (data x fsdp), not DDP/DeepSpeed
- signal ops (STFT/mel/resample/loudness) on XLA FFT, Pallas for hot fusions
"""

__version__ = "0.1.0"
