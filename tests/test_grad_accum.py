"""Micro-batched gradient accumulation is EXACT for mask-weighted losses.

The Trainer's ``micro_batches`` path (train/trainer.py) accumulates
``sum_i(w_i * g_i) / sum_i(w_i)`` where ``w_i`` is the microbatch's
``loss_weight`` (masked-token count). For a full-batch loss defined as a
masked mean over ALL positions, that sum IS the full-batch gradient — no
approximation. These tests pin that equality through the real Trainer step
(AdamW included), plus the unweighted fall-back semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tts_tpu.train.trainer import Trainer, TrainingArguments


def _args(tmp_path, micro_batches):
    return TrainingArguments(
        output_dir=str(tmp_path / f"m{micro_batches}"),
        max_steps=10,
        warmup_steps=1,
        learning_rate=1e-2,
        logging_steps=1,
        save_steps=100,
        micro_batches=micro_batches,
        overwrite_output_dir=True,
    )


def _masked_loss_fn(params, batch, rng):
    # masked-mean squared error: the same objective family as the s2a
    # masked CE (mean over masked positions of the WHOLE batch).
    pred = batch["x"] @ params["w"]
    err = (pred - batch["y"]) ** 2
    mask = batch["mask"].astype(jnp.float32)
    loss = jnp.sum(err * mask) / jnp.sum(mask)
    return loss, {"loss_weight": jnp.sum(mask), "mse": loss}


def _batch(b=8, d=6):
    rng = np.random.default_rng(0)
    return {
        "x": jnp.asarray(rng.normal(size=(b, d)), jnp.float32),
        "y": jnp.asarray(rng.normal(size=(b,)), jnp.float32),
        # deliberately non-uniform mask counts per microbatch so an
        # unweighted mean-of-means would be WRONG
        "mask": jnp.asarray(rng.random(b) < 0.6, jnp.float32).at[0].set(1.0),
    }


def _init(d=6):
    return {"w": jnp.linspace(-1.0, 1.0, d).astype(jnp.float32)}


@pytest.mark.parametrize("n_micro", [2, 4])
def test_accum_matches_full_batch(tmp_path, n_micro):
    batch = _batch()
    key = jax.random.PRNGKey(7)

    t_full = Trainer(_args(tmp_path, 1), _masked_loss_fn, _init())
    t_acc = Trainer(_args(tmp_path, n_micro), _masked_loss_fn, _init())

    s_full, m_full = t_full._train_step(t_full.state, batch, key)
    s_acc, m_acc = t_acc._train_step(t_acc.state, batch, key)

    np.testing.assert_allclose(
        np.asarray(s_acc.params["w"]), np.asarray(s_full.params["w"]),
        rtol=0, atol=1e-6,
    )
    np.testing.assert_allclose(
        float(m_acc["loss"]), float(m_full["loss"]), atol=1e-6
    )
    np.testing.assert_allclose(
        float(m_acc["grad_norm"]), float(m_full["grad_norm"]), rtol=1e-5
    )
    # the auxiliary metric is the same weighted mean
    np.testing.assert_allclose(
        float(m_acc["mse"]), float(m_full["mse"]), atol=1e-6
    )
    # loss_weight is consumed by the accumulator, not logged
    assert "loss_weight" not in m_acc and "loss_weight" not in m_full


def test_accum_unweighted_fallback(tmp_path):
    """Without loss_weight, microbatches average uniformly — exact when the
    per-microbatch loss is an unmasked mean over equal-size microbatches."""

    def loss_fn(params, batch, rng):
        pred = batch["x"] @ params["w"]
        return jnp.mean((pred - batch["y"]) ** 2), {}

    batch = {k: v for k, v in _batch().items() if k != "mask"}
    key = jax.random.PRNGKey(7)
    t_full = Trainer(_args(tmp_path, 1), loss_fn, _init())
    t_acc = Trainer(_args(tmp_path, 4), loss_fn, _init())
    s_full, m_full = t_full._train_step(t_full.state, batch, key)
    s_acc, m_acc = t_acc._train_step(t_acc.state, batch, key)
    np.testing.assert_allclose(
        np.asarray(s_acc.params["w"]), np.asarray(s_full.params["w"]),
        rtol=0, atol=1e-6,
    )
    np.testing.assert_allclose(
        float(m_acc["loss"]), float(m_full["loss"]), atol=1e-6
    )


def test_accum_sharded_matches_single_device(tmp_path):
    """The scan-internal sharding constraint keeps microbatches on the data
    axis: an (8-device data) mesh gives the same update as 1 device."""
    from edm_tts_tpu.parallel.mesh import make_mesh

    batch = _batch(b=16)
    key = jax.random.PRNGKey(3)
    t_one = Trainer(
        _args(tmp_path, 4), _masked_loss_fn, _init(),
        mesh=make_mesh(devices=jax.devices()[:1]),
    )
    t_eight = Trainer(
        _args(tmp_path / "8", 4), _masked_loss_fn, _init(), mesh=make_mesh(n_fsdp=1)
    )
    s_one, m_one = t_one._train_step(t_one.state, batch, key)
    s_eight, m_eight = t_eight._train_step(t_eight.state, batch, key)
    np.testing.assert_allclose(
        np.asarray(s_eight.params["w"]), np.asarray(s_one.params["w"]),
        rtol=0, atol=1e-6,
    )
    np.testing.assert_allclose(
        float(m_eight["loss"]), float(m_one["loss"]), atol=1e-6
    )
