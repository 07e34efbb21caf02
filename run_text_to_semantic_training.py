"""Text->semantic training entry point.

Same YAML surface as the reference
(/root/reference/run_text_to_semantic_training.py +
configs/text_to_semantic_w_length/train_config.yaml): text+codes shards,
the 20 < sem_len < 1250 / sem_len > text_len filter, the joint-sequence
collator (host-side here — see data/collators.py), length-bucketed batches
(replacing ``group_by_length``), cosine LR, bf16, auto-resume.

Usage: python run_text_to_semantic_training.py configs/text_to_semantic_w_length/train_config.yaml
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp


def t2s_batch_iterator(shard_dir, batch_size, seed, use_pt=False):
    from edm_tts_tpu.data.collators import collate_t2s, length_bucketed, t2s_filter
    from edm_tts_tpu.data.pipeline import shuffle_buffer
    from edm_tts_tpu.data.token_shards import (
        iter_reference_pt_shards,
        iter_token_shards,
    )

    epoch = 0
    while True:
        it = (iter_reference_pt_shards if use_pt else iter_token_shards)(shard_dir)
        filtered = (ex for ex in shuffle_buffer(it, 2000, seed=seed + epoch)
                    if t2s_filter(ex))
        for group in length_bucketed(filtered, batch_size, seed=seed + epoch):
            yield collate_t2s(group)
        epoch += 1


def main():
    from edm_tts_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # EDM_PLATFORM=cpu overrides the axon plugin
    from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic
    from edm_tts_tpu.train.trainer import Trainer, TrainingArguments
    from edm_tts_tpu.utils.config import load_yaml
    from edm_tts_tpu.utils.logging import setup_logging

    setup_logging()
    raw = load_yaml(sys.argv[1])

    model_cfg_d = dict(raw.get("model_config", {}))
    model_cfg_d.update(raw.get("extra_model_params", {}) or {})
    cfg = T2SConfig.from_dict(model_cfg_d)

    args = TrainingArguments(
        output_dir=raw.get("output_dir", "exp/edm_tts/text_to_semantic_w_length"),
        seed=raw.get("seed", 42),
        per_device_train_batch_size=raw.get("per_device_train_batch_size", 32),
        max_steps=raw.get("max_steps", 300_000),
        learning_rate=raw.get("learning_rate", 2.5e-4),
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
        n_model=raw.get("n_model", 1),
        n_seq=raw.get("n_seq", 1),
        skip_nonfinite_updates=raw.get("skip_nonfinite_updates", False),
        # HF Trainer's WandbCallback honors WANDB_WATCH; same env var here
        watch=raw.get("watch", os.environ.get("WANDB_WATCH") or None),
    )

    import jax.numpy as _jnp

    dtype = _jnp.bfloat16 if raw.get("bf16", True) else _jnp.float32
    model = TextToSemantic(cfg, dtype=dtype)
    b, l, lt = 1, 64, 16
    params = jax.jit(
        lambda r: model.init(
            r,
            jnp.zeros((b, l), jnp.int32),
            jnp.ones((b, l), bool),
            jnp.zeros((b, l), bool),
            jnp.zeros((b, lt), jnp.int32),
            jnp.ones((b, lt), bool),
            jnp.ones((b,)),
            mask_rng=r,
            train=False,
        )
    )(jax.random.PRNGKey(args.seed))

    def loss_fn(p, batch, rng):
        drop_rng, mask_rng = jax.random.split(rng)
        out = model.apply(
            p,
            batch["input_ids"],
            batch["attention_mask"],
            batch["speech_mask"],
            batch["text_ids"],
            batch["text_attention_mask"],
            batch["speech_lengths"],
            mask_rng=mask_rng,
            train=True,
            rngs={"dropout": drop_rng},
        )
        return out["loss"], {
            "ce_loss": out["ce_loss"],
            "length_loss": out["length_loss"],
        }

    batch = args.per_device_train_batch_size * jax.device_count()
    train_iter = t2s_batch_iterator(
        raw.get("dataset_args", {}).get("data_dir", "data/text_codes"),
        batch,
        args.seed,
        use_pt=raw.get("dataset_args", {}).get("format") == "pt",
    )
    if raw.get("preprocessing_only"):
        b0 = next(train_iter)
        print("preprocessing ok;", {k: v.shape for k, v in b0.items()})
        return

    # Held-out eval (beyond the reference recipe — evaluation_strategy "no"
    # in configs/text_to_semantic_w_length/train_config.yaml — but HF
    # Trainer supports eval_dataset): fixed batches from a disjoint shard
    # dir, deterministic mask draw so eval CE is comparable across evals.
    eval_iter, eval_fn = None, None
    ev = raw.get("eval_dataset_args")
    if ev:
        import itertools

        eval_iter = list(itertools.islice(
            t2s_batch_iterator(
                ev["data_dir"],
                raw.get("per_device_eval_batch_size", 32) * jax.device_count(),
                seed=args.seed + 1, use_pt=ev.get("format") == "pt",
            ),
            int(raw.get("eval_batches", 4)),
        ))

        @jax.jit
        def eval_fn(p, batch):
            out = model.apply(
                p, batch["input_ids"], batch["attention_mask"],
                batch["speech_mask"], batch["text_ids"],
                batch["text_attention_mask"], batch["speech_lengths"],
                mask_rng=jax.random.PRNGKey(args.seed + 2), train=False,
            )
            return {"loss": out["loss"], "ce_loss": out["ce_loss"],
                    "length_loss": out["length_loss"]}

    trainer = Trainer(args, loss_fn, params, eval_fn=eval_fn)
    state = trainer.train(train_iter, eval_iter)

    # final-model export: an inference-loadable dir (params + config.json)
    # for inference.py --t2s_model / hub.load_t2s (the HF save_model analog)
    from edm_tts_tpu.utils.hub import save_t2s

    export_dir = os.path.join(args.output_dir, "export")
    save_t2s(export_dir, model, jax.device_get(state.params))
    print(f"exported inference-ready model to {export_dir}")


if __name__ == "__main__":
    main()
