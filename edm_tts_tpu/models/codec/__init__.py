from edm_tts_tpu.models.codec.config import CodecConfig
from edm_tts_tpu.models.codec.model import Codec, pad_audio_to_hop
from edm_tts_tpu.models.codec.rvq import ResidualVQ
from edm_tts_tpu.models.codec.encoder import Encoder
from edm_tts_tpu.models.codec.decoder import Decoder
