from edm_tts_tpu.models.t2s.config import SPECIAL_TOKENS, T2SConfig
from edm_tts_tpu.models.t2s.model import TextToSemantic
from edm_tts_tpu.models.t2s.sampler import build_canvas, t2s_sample
