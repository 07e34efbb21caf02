from edm_tts_tpu.ops.convolution import (
    conv1d,
    conv1d_output_length,
    conv_transpose1d,
    conv_transpose1d_phases,
    encoder_output_length,
    weight_norm,
)
from edm_tts_tpu.ops.snake import snake
from edm_tts_tpu.ops.rope import apply_rope, rope_frequencies, rotate_half
from edm_tts_tpu.ops.masking import (
    cosine_schedule_mask,
    masked_mean,
    positional_categorical,
    positional_gumbel,
    random_topk_mask,
    sampling_mask_ratios,
)
from edm_tts_tpu.ops.attention import mha, mha_reference
from edm_tts_tpu.ops.ring_attention import make_seq_mesh, ring_mha
from edm_tts_tpu.ops.embedding import embed_take, masked_cross_entropy

# heavier ops are intentionally NOT imported eagerly (keep import light):
# - edm_tts_tpu.ops.spectral: stft / spectrogram / mel_spectrogram / mel_filterbank
# - edm_tts_tpu.ops.resample: resample / resample_numpy
# - edm_tts_tpu.ops.loudness: integrated_loudness / normalize_loudness / biquad_scan
# - edm_tts_tpu.ops.kmeans: kmeans
# - edm_tts_tpu.ops.pallas_attention: flash_mha / flash_mha_diff
# - edm_tts_tpu.ops.pallas_resunit: fused_residual_unit
