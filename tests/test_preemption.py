"""Preemption-safe training: SIGTERM mid-run cuts a checkpoint at the
in-flight step, and auto-resume continues from exactly there — the pod
eviction story (train/preemption.py). Uses a REAL signal delivered to this
process while the Trainer loop runs in the main thread.
"""

import os
import signal
import threading

import jax
import jax.numpy as jnp
import numpy as np

from edm_tts_tpu.train.preemption import PreemptionGuard
from edm_tts_tpu.train.trainer import Trainer, TrainingArguments


def _loss_fn(params, batch, rng):
    pred = batch["x"] @ params["w"]
    return jnp.mean((pred - batch["y"]) ** 2), {}


def _init():
    return {"w": jnp.linspace(-1.0, 1.0, 4).astype(jnp.float32)}


def _batches():
    rng = np.random.default_rng(0)
    while True:
        yield {
            "x": jnp.asarray(rng.normal(size=(8, 4)), jnp.float32),
            "y": jnp.asarray(rng.normal(size=(8,)), jnp.float32),
        }


def _args(tmp_path, max_steps, resume=False):
    return TrainingArguments(
        output_dir=str(tmp_path / "run"),
        max_steps=max_steps,
        warmup_steps=1,
        logging_steps=1000,
        save_steps=10_000,  # periodic saves never fire in this test
        overwrite_output_dir=not resume,
    )


def test_guard_latches_and_restores_handler():
    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert not g.triggered
        os.kill(os.getpid(), signal.SIGTERM)
        # the handler runs on the main thread at the next bytecode boundary
        for _ in range(1000):
            if g.triggered:
                break
        assert g.triggered
    assert signal.getsignal(signal.SIGTERM) is prev


def test_sigterm_checkpoints_and_resumes(tmp_path):
    trainer = Trainer(_args(tmp_path, max_steps=10_000), _loss_fn, _init())

    class SignalingIterator:
        """Delivers SIGTERM from a side thread while step 3's batch is
        fetched; the loop must finish that step, save, and stop."""

        def __init__(self):
            self.it = _batches()
            self.n = 0

        def __iter__(self):
            return self

        def __next__(self):
            self.n += 1
            if self.n == 3:
                t = threading.Thread(
                    target=os.kill, args=(os.getpid(), signal.SIGTERM)
                )
                t.start()
                t.join()
            return next(self.it)

    trainer.train(SignalingIterator())
    saved = trainer.ckpt.latest_step()
    assert saved is not None and 3 <= saved < 100  # stopped almost immediately

    # auto-resume picks up the preemption checkpoint and runs to completion
    trainer2 = Trainer(
        _args(tmp_path, max_steps=saved + 2, resume=True), _loss_fn, _init()
    )
    state = trainer2.train(_batches())
    assert int(state.step) == saved + 2
