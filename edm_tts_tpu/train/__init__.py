from edm_tts_tpu.train.optim import (
    adamw,
    exponential_schedule,
    freeze_subtree_mask,
    warmup_cosine_schedule,
)
from edm_tts_tpu.train.trainer import Trainer, TrainingArguments
from edm_tts_tpu.train.gan import gan_train_step, gan_eval_step, DEFAULT_LAMBDAS
from edm_tts_tpu.train.gan_trainer import GANTrainer, GANTrainingArguments
