from edm_tts_tpu.serving.batcher import DynamicBatcher, Request
from edm_tts_tpu.serving.chunking import join_waveforms, split_text
from edm_tts_tpu.serving.engine import TTSEngine
from edm_tts_tpu.serving.server import TTSServer
