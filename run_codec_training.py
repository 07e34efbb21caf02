"""Adversarial codec training entry point.

Same YAML surface as the reference (/root/reference/run_codec_training.py +
configs/dac/train_config.yaml): generator/discriminator args, optimizer +
ExponentialLR settings, loss lambdas, LibriLight streaming pipeline with
0.38 s crops / silence filter / -16 dBFS normalize. Distribution is a
jax Mesh instead of ``accelerate launch``.

Usage: python run_codec_training.py configs/dac/train_config.yaml
"""

from __future__ import annotations

import dataclasses
import os
import sys

import jax
import numpy as np


@dataclasses.dataclass
class DataArguments:
    dataset_path: str = "librilight"
    dataset_name: str = "all"
    data_dir: str = "data/libri-light/unlab"
    training_segment_length: float = 0.38
    validation_segment_length: float = 5.0
    silence_threshold: float = -40.0
    volume_normalize: float = -16.0
    shuffle_buffer_size: int = 10000
    validation_split: int = 16
    preprocessing_only: bool = False
    # reference dataloader_num_workers (train_config.yaml: 32 torch workers);
    # here: C++ FLAC-decode pool threads (0 = sync decode in the host loop)
    dataloader_num_workers: int = 0


def build_pipeline(data_args: DataArguments, sample_rate: int, batch_size: int,
                   seed: int):
    from edm_tts_tpu.data.collators import collate_codec_audio
    from edm_tts_tpu.data.manifests import librilight_manifest, librispeech_manifest
    from edm_tts_tpu.data.pipeline import batched, codec_audio_pipeline

    if "librispeech" in data_args.dataset_path:
        manifest = list(librispeech_manifest(data_args.data_dir, data_args.dataset_name))
    else:
        manifest = list(librilight_manifest(data_args.data_dir, data_args.dataset_name))
    val = manifest[: data_args.validation_split]
    train = manifest[data_args.validation_split :]

    train_iter = batched(
        codec_audio_pipeline(
            train,
            target_sr=sample_rate,
            segment_seconds=data_args.training_segment_length,
            silence_threshold_db=data_args.silence_threshold,
            normalize_dbfs=data_args.volume_normalize,
            shuffle=data_args.shuffle_buffer_size,
            seed=seed,
            prefetch_threads=data_args.dataloader_num_workers,
        ),
        batch_size,
        stack=collate_codec_audio,
    )

    def val_iter():
        return batched(
            codec_audio_pipeline(
                val,
                target_sr=sample_rate,
                segment_seconds=data_args.validation_segment_length,
                silence_threshold_db=data_args.silence_threshold,
                normalize_dbfs=data_args.volume_normalize,
                shuffle=1,
                seed=0,
                repeat=False,
            ),
            4,
            stack=collate_codec_audio,
        )

    return train_iter, val_iter


def main():
    from edm_tts_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # EDM_PLATFORM=cpu overrides the axon plugin
    from edm_tts_tpu.models.codec import Codec, CodecConfig
    from edm_tts_tpu.models.codec.discriminator import (
        Discriminator,
        DiscriminatorConfig,
    )
    from edm_tts_tpu.models.codec.losses import ReconstructionLoss
    from edm_tts_tpu.train.gan_trainer import GANTrainer, GANTrainingArguments
    from edm_tts_tpu.utils.config import load_yaml
    from edm_tts_tpu.utils.logging import setup_logging

    setup_logging()
    raw = load_yaml(sys.argv[1])

    gen_cfg = CodecConfig.from_dict(raw.get("generator_args", {}))
    disc_cfg = DiscriminatorConfig.from_dict(raw.get("discriminator_args", {}))
    train_args = GANTrainingArguments(
        output_dir=raw.get("output_dir", "exp/edm_tts/dac"),
        seed=raw.get("seed", 42),
        max_steps=raw.get("max_steps", 100_000),
        logging_steps=raw.get("logging_steps", 100),
        eval_steps=raw.get("eval_steps", 1000),
        save_steps=raw.get("save_steps", 10_000),
        gen_lr=raw.get("gen_optimizer_args", {}).get("lr", 1e-4),
        disc_lr=raw.get("disc_optimizer_args", {}).get("lr", 1e-4),
        gen_betas=tuple(raw.get("gen_optimizer_args", {}).get("betas", (0.8, 0.99))),
        disc_betas=tuple(raw.get("disc_optimizer_args", {}).get("betas", (0.8, 0.99))),
        scheduler_gamma=raw.get("gen_scheduler_args", {}).get("gamma", 0.999996),
        skip_nonfinite_updates=raw.get("skip_nonfinite_updates", False),
        # reference sets WANDB_WATCH=all for codec training (run_codec_training.py:201)
        watch=raw.get("watch", os.environ.get("WANDB_WATCH") or None),
    )
    data_args = DataArguments(
        data_dir=raw.get("dataset_args", {}).get("data_dir", "data"),
        dataset_name=raw.get("dataset_args", {}).get("name", "all"),
        dataset_path=raw.get("dataset_args", {}).get("path", "librilight"),
        training_segment_length=raw.get("training_segment_length", 0.38),
        validation_segment_length=raw.get("validation_segment_length", 5.0),
        silence_threshold=raw.get("silence_threshold", -40.0),
        volume_normalize=raw.get("volume_normalize", -16.0),
        shuffle_buffer_size=raw.get("shuffle_buffer_size", 10000),
        validation_split=raw.get("validation_split", 16),
        preprocessing_only=raw.get("preprocessing_only", False),
        dataloader_num_workers=raw.get("dataloader_num_workers", 0),
    )

    codec = Codec(gen_cfg)
    disc = Discriminator(disc_cfg)
    batch = int(raw.get("per_device_train_batch_size", 32)) * jax.device_count()
    train_iter, val_iter = build_pipeline(
        data_args, gen_cfg.sample_rate, batch, train_args.seed
    )
    if data_args.preprocessing_only:
        # dry-run the data pipeline and exit (reference :156-159, 254-255)
        sample = next(train_iter)
        print("preprocessing ok; batch", np.asarray(sample).shape)
        return

    seg = int(data_args.training_segment_length * gen_cfg.sample_rate)
    key = jax.random.PRNGKey(train_args.seed)
    g_params = jax.jit(codec.init)(key, np.zeros((1, seg, 1), np.float32))
    d_params = jax.jit(disc.init)(key, np.zeros((1, seg, 1), np.float32))

    recon = ReconstructionLoss(
        gen_cfg.sample_rate,
        raw.get("waveform_args"),
        raw.get("multi_scale_stft_args"),
        raw.get("mel_spectrogram_args") or {},
    )
    trainer = GANTrainer(
        train_args, codec, disc, g_params, d_params, recon,
        lambdas=raw.get("lambdas"),
    )
    # pass the FACTORY: each eval pass re-builds the val stream (a one-shot
    # generator would leave every eval after the first empty -> NaN mel)
    trainer.train(train_iter, val_iter, config_json=gen_cfg.to_json())


if __name__ == "__main__":
    main()
