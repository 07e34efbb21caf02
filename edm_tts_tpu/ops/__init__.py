from edm_tts_tpu.ops.convolution import (
    conv1d,
    conv1d_output_length,
    conv_transpose1d,
    encoder_output_length,
    weight_norm,
)
from edm_tts_tpu.ops.snake import snake
from edm_tts_tpu.ops.rope import apply_rope, rope_frequencies, rotate_half
from edm_tts_tpu.ops.masking import (
    cosine_schedule_mask,
    masked_mean,
    random_topk_mask,
    sampling_mask_ratios,
)
from edm_tts_tpu.ops.attention import mha, mha_reference
