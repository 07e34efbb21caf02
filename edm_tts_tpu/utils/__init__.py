from edm_tts_tpu.utils.logging import MetricLogger, logger, setup_logging
