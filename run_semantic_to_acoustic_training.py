"""Semantic->acoustic (injection Conformer) training entry point.

Same YAML surface as the reference
(/root/reference/run_semantic_to_acoustic_training.py +
configs/injection_conformer/train_config.yaml): streaming codes dataset with
15.36 s (768-frame) random crops, base config + ``extra_model_params``
override, warm start, cosine LR warmup 4000 / 100k steps / bf16, auto-resume
+ time-limit stop. ZeRO-2 becomes fsdp sharding on the mesh.

Usage: python run_semantic_to_acoustic_training.py configs/injection_conformer/train_config.yaml
"""

from __future__ import annotations

import os
import random
import sys

import jax
import jax.numpy as jnp


def code_batch_iterator(shard_dir, segment_frames, batch_size, seed, use_pt=False):
    from edm_tts_tpu.data.collators import collate_s2a
    from edm_tts_tpu.data.pipeline import crop_code_example, shuffle_buffer
    from edm_tts_tpu.data.token_shards import (
        iter_reference_pt_shards,
        iter_token_shards,
    )

    rng = random.Random(seed)
    epoch = 0
    buf = []
    while True:
        it = (iter_reference_pt_shards if use_pt else iter_token_shards)(shard_dir)
        for ex in shuffle_buffer(it, 1000, seed=seed + epoch):
            crop = crop_code_example(ex, segment_frames, rng)
            if crop is None:
                continue
            buf.append(crop)
            if len(buf) == batch_size:
                yield collate_s2a(buf)
                buf = []
        epoch += 1


def main():
    from edm_tts_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # EDM_PLATFORM=cpu overrides the axon plugin
    from edm_tts_tpu.models.codec import CodecConfig
    from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig
    from edm_tts_tpu.train.optim import freeze_subtree_mask
    from edm_tts_tpu.train.trainer import Trainer, TrainingArguments
    from edm_tts_tpu.utils.config import load_yaml
    from edm_tts_tpu.utils.hub import load_codec
    from edm_tts_tpu.utils.logging import setup_logging

    setup_logging()
    raw = load_yaml(sys.argv[1])

    model_cfg_d = dict(raw.get("model_config", {}))
    model_cfg_d.update(raw.get("extra_model_params", {}) or {})
    acoustic_model_path = raw.get(
        "acoustic_model_path", model_cfg_d.pop("acoustic_model_path", None)
    )
    model_cfg_d.pop("acoustic_model_path", None)
    # reference-style nested encoder_config -> flat S2AConfig fields
    enc = model_cfg_d.pop("encoder_config", None) or {}
    for src, dst in [
        ("depth", "encoder_num_layers"),
        ("heads", "encoder_num_heads"),
        ("ff_mult", "encoder_ff_mult"),
        ("conv_kernel_size", "encoder_conv_kernel_size"),
        ("attn_dropout", "encoder_attn_dropout"),
        ("ff_dropout", "encoder_ff_dropout"),
        ("conv_dropout", "encoder_conv_dropout"),
    ]:
        if src in enc:
            model_cfg_d[dst] = enc[src]
    cfg = S2AConfig.from_dict(model_cfg_d)

    # embed the frozen codec: load its exported params if available
    codec_params = None
    if acoustic_model_path:
        codec, codec_params = load_codec(acoustic_model_path)
        cfg = S2AConfig.from_dict({**model_cfg_d, "codec": codec.config.__dict__})

    args = TrainingArguments(
        output_dir=raw.get("output_dir", "exp/edm_tts/injection_conformer"),
        seed=raw.get("seed", 42),
        per_device_train_batch_size=raw.get("per_device_train_batch_size", 32),
        max_steps=raw.get("max_steps", 100_000),
        learning_rate=raw.get("learning_rate", 3e-4),
        warmup_steps=raw.get("warmup_steps", 4000),
        weight_decay=raw.get("weight_decay", 0.0),
        adam_beta1=raw.get("adam_beta1", 0.8),
        adam_beta2=raw.get("adam_beta2", 0.99),
        adam_epsilon=raw.get("adam_epsilon", 1e-8),
        max_grad_norm=raw.get("max_grad_norm", 0.5),
        logging_steps=raw.get("logging_steps", 100),
        eval_steps=raw.get("eval_steps", 1000),
        save_steps=raw.get("save_steps", 10_000),
        save_total_limit=raw.get("save_total_limit", 2),
        time_limit=raw.get("time_limit"),
        resume_from_checkpoint=raw.get("resume_from_checkpoint"),
        overwrite_output_dir=raw.get("overwrite_output_dir", False),
        n_fsdp=raw.get("n_fsdp", 1),
        micro_batches=raw.get("micro_batches", 1),
        n_model=raw.get("n_model", 1),
        n_seq=raw.get("n_seq", 1),
        skip_nonfinite_updates=raw.get("skip_nonfinite_updates", False),
        # HF Trainer's WandbCallback honors WANDB_WATCH; same env var here
        watch=raw.get("watch", os.environ.get("WANDB_WATCH") or None),
    )

    import jax.numpy as _jnp

    dtype = _jnp.bfloat16 if raw.get("bf16", True) else _jnp.float32
    model = InjectionConformer(cfg, dtype=dtype)
    segment_frames = int(
        raw.get("training_segment_length", 15.36)
        * cfg.codec.sample_rate
        / cfg.codec.hop_length
    )
    init_rng = jax.random.PRNGKey(args.seed)
    params = jax.jit(
        lambda r: model.init(
            r,
            jnp.zeros((1, cfg.num_quantizers, 8), jnp.int32),
            jnp.zeros((1, 8), jnp.int32),
            mask_rng=r,
            train=False,
        )
    )(init_rng)
    if codec_params is not None:
        params = {
            "params": {**params["params"], "codec": codec_params["params"]}
        }

    # optional warm start from an exported s2a model dir (the reference's
    # strict safetensors warm-start, run_semantic_to_acoustic_training.py:192-196)
    if raw.get("warm_start_model"):
        from edm_tts_tpu.parallel.checkpoint import load_model_params

        params = load_model_params(raw["warm_start_model"], params)

    frozen = freeze_subtree_mask(params, "codec")

    def loss_fn(p, batch, rng):
        drop_rng, mask_rng = jax.random.split(rng)
        out = model.apply(
            p,
            batch["acoustic_tokens"],
            batch["semantic_tokens"],
            mask_rng=mask_rng,
            train=True,
            rngs={"dropout": drop_rng},
        )
        # loss_weight = masked-token count makes micro-batched gradient
        # accumulation EXACT for the masked-mean CE (Trainer docstring).
        return out["loss"], {"loss_weight": jnp.sum(out["mask"])}

    batch = args.per_device_train_batch_size * jax.device_count()
    train_iter = code_batch_iterator(
        raw.get("dataset_args", {}).get("data_dir", "data/codes"),
        segment_frames,
        batch,
        args.seed,
        use_pt=raw.get("dataset_args", {}).get("format") == "pt",
    )
    if raw.get("preprocessing_only"):
        b = next(train_iter)
        print("preprocessing ok;", {k: v.shape for k, v in b.items()})
        return

    # Held-out eval (beyond the reference recipe, which sets
    # evaluation_strategy "no" — configs/injection_conformer/
    # train_config.yaml:53 — but HF Trainer supports eval_dataset):
    # fixed batches from a disjoint shard dir, deterministic mask draw per
    # batch index so the eval masked-CE is comparable across eval points.
    eval_iter, eval_fn = None, None
    ev = raw.get("eval_dataset_args")
    if ev:
        import itertools

        eval_iter = list(itertools.islice(
            code_batch_iterator(
                ev["data_dir"], segment_frames,
                raw.get("per_device_eval_batch_size", 16) * jax.device_count(),
                seed=args.seed + 1, use_pt=ev.get("format") == "pt",
            ),
            int(raw.get("eval_batches", 4)),
        ))

        @jax.jit
        def eval_fn(p, batch):
            out = model.apply(
                p, batch["acoustic_tokens"], batch["semantic_tokens"],
                mask_rng=jax.random.PRNGKey(args.seed + 2), train=False,
            )
            return {"loss": out["loss"]}

    trainer = Trainer(args, loss_fn, params, frozen_mask=frozen,
                      eval_fn=eval_fn)
    state = trainer.train(train_iter, eval_iter)

    # final-model export (HF Trainer checkpoints double as model dirs the
    # reference's inference.py loads directly; our orbax train-state
    # checkpoints don't, so publish an inference-loadable dir): params +
    # config.json consumable by inference.py --s2a_model / hub.load_s2a.
    from edm_tts_tpu.utils.hub import save_s2a

    export_dir = os.path.join(args.output_dir, "export")
    save_s2a(export_dir, model, jax.device_get(state.params))
    print(f"exported inference-ready model to {export_dir}")


if __name__ == "__main__":
    main()
