from edm_tts_tpu.data.audio_io import audio_info, load_audio, save_wav
from edm_tts_tpu.data.manifests import (
    chunk_jsonl_gz,
    libriheavy_manifest,
    librilight_manifest,
    librispeech_manifest,
)
from edm_tts_tpu.data.text_norm import clean_text, normalize_text, text_to_bytes
from edm_tts_tpu.data.token_shards import (
    TokenShardWriter,
    iter_reference_pt_shards,
    iter_token_shards,
)
from edm_tts_tpu.data.collators import (
    collate_codec_audio,
    collate_dump_batch,
    collate_s2a,
    collate_t2s,
    length_bucketed,
    t2s_filter,
)
from edm_tts_tpu.data.pipeline import (
    batched,
    codec_audio_pipeline,
    crop_code_example,
    load_audio_segments,
    shard_for_process,
    shuffle_buffer,
    silence_filter,
    volume_normalize,
)
