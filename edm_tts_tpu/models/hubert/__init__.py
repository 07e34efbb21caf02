from edm_tts_tpu.models.hubert.config import (
    HUBERT_LARGE_LL60K,
    HUBERT_TINY_TEST,
    HubertConfig,
)
from edm_tts_tpu.models.hubert.model import HubertModel, normalize_input
from edm_tts_tpu.models.hubert.convert import from_hf_state_dict
