from edm_tts_tpu.parallel.mesh import (
    DATA_AXIS,
    FSDP_AXIS,
    MODEL_AXIS,
    batch_sharding,
    fsdp_sharding_for,
    make_mesh,
    param_shardings,
    replicated,
    shard_pytree,
)
from edm_tts_tpu.parallel.pipeline import (
    PIPE_AXIS,
    make_pipe_mesh,
    pipeline_apply,
    stack_stage_params,
)
from edm_tts_tpu.parallel.checkpoint import (
    CheckpointManager,
    detect_last_checkpoint,
    export_model,
    load_model_params,
)
