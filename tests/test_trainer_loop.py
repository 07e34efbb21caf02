"""Trainer integration: a few real steps on synthetic token shards, with
checkpoint save + resume — the HF-Trainer-equivalent loop end to end."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tts_tpu.data.token_shards import TokenShardWriter
from edm_tts_tpu.models.codec import CodecConfig
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig
from edm_tts_tpu.train.optim import freeze_subtree_mask
from edm_tts_tpu.train.trainer import Trainer, TrainingArguments

TINY_CODEC = CodecConfig(
    encoder_dim=4, decoder_dim=32, n_codebooks=4, codebook_size=16,
    codebook_dim=4, quantizer_dropout=0.0,
)
TINY = S2AConfig(
    hidden_size=32, num_semantic_tokens=16, encoder_num_heads=4,
    encoder_num_layers=3, injection_layers=(1,),
    encoder_attn_dropout=0.0, encoder_ff_dropout=0.0, encoder_conv_dropout=0.0,
    codec=TINY_CODEC,
)


def _write_shards(path, n_items=8, t=32):
    rng = np.random.default_rng(0)
    w = TokenShardWriter(str(path), items_per_shard=4)
    for i in range(n_items):
        w.add(
            f"u{i}",
            rng.integers(0, 16, (4, t)).astype(np.int16),
            rng.integers(0, 16, (t,)).astype(np.int16),
        )
    w.close()


def _make(args_dir, max_steps, resume=False):
    import run_semantic_to_acoustic_training as s2a_run

    model = InjectionConformer(TINY)
    params = jax.jit(
        lambda r: model.init(
            r, jnp.zeros((1, 4, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32),
            mask_rng=r, train=False,
        )
    )(jax.random.PRNGKey(0))

    def loss_fn(p, batch, rng):
        out = model.apply(
            p, batch["acoustic_tokens"], batch["semantic_tokens"],
            mask_rng=rng, train=False,
        )
        return out["loss"], {}

    args = TrainingArguments(
        output_dir=str(args_dir),
        max_steps=max_steps,
        logging_steps=1,
        save_steps=2,
        eval_steps=1000,
        warmup_steps=1,
        overwrite_output_dir=not resume,
    )
    frozen = freeze_subtree_mask(params, "codec")
    from edm_tts_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(2, 1, devices=jax.devices()[:2])
    return Trainer(args, loss_fn, params, frozen_mask=frozen, mesh=mesh), s2a_run


def test_train_resume_and_metrics(tmp_path):
    import run_semantic_to_acoustic_training as s2a_run

    shard_dir = tmp_path / "shards"
    _write_shards(shard_dir)
    out_dir = tmp_path / "run"

    def data_iter():
        return s2a_run.code_batch_iterator(str(shard_dir), 16, 2, seed=0)

    trainer, _ = _make(out_dir, max_steps=2)
    state = trainer.train(data_iter())
    assert int(state.step) == 2
    assert trainer.ckpt.latest_step() == 2

    # resume continues from the checkpoint to the new max_steps
    trainer2, _ = _make(out_dir, max_steps=4, resume=True)
    state2 = trainer2.train(data_iter())
    assert int(state2.step) == 4

    metrics_path = out_dir / "metrics.jsonl"
    lines = [json.loads(l) for l in open(metrics_path)]
    steps = [l["step"] for l in lines]
    assert 1 in steps and 4 in steps
    assert all(np.isfinite(l.get("train/loss", 0.0)) for l in lines)


def test_nonempty_dir_without_checkpoints_raises(tmp_path):
    """Reference utils.py:30-46: a non-empty output dir with no checkpoints
    raises (accidental-overwrite guard) unless overwrite_output_dir."""
    from edm_tts_tpu.parallel.checkpoint import detect_last_checkpoint

    d = tmp_path / "out"
    d.mkdir()
    (d / "stale.txt").write_text("x")
    with pytest.raises(ValueError):
        detect_last_checkpoint(str(d))
    assert detect_last_checkpoint(str(d), overwrite_output_dir=True) is None
    (d / "checkpoint_5").mkdir()
    assert detect_last_checkpoint(str(d)) == 5


def test_code_batch_iterator_shapes(tmp_path):
    import run_semantic_to_acoustic_training as s2a_run

    shard_dir = tmp_path / "shards"
    _write_shards(shard_dir, t=40)
    it = s2a_run.code_batch_iterator(str(shard_dir), 16, 3, seed=1)
    batch = next(it)
    assert batch["acoustic_tokens"].shape == (3, 4, 16)
    assert batch["semantic_tokens"].shape == (3, 16)
