from edm_tts_tpu.models.s2a.config import S2AConfig
from edm_tts_tpu.models.s2a.model import InjectionConformer
from edm_tts_tpu.models.s2a.sampler import s2a_sample
