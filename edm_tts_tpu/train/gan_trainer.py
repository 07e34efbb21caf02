"""Host loop for adversarial codec training.

The TPU-native counterpart of the reference GANTrainer
(/root/reference/edm_tts/trainers/gan_trainer.py:12-287): per-batch G+D
update (one jitted step, see ``gan.py``), per-step exponential LR schedules
(gamma 0.999996 inside optax), periodic eval (mel loss on reconstructions,
:229-248), best-generator export (:278-280), full-state checkpoints with
metadata (epoch/step/best_val_loss, :12-26,104-106) and auto-resume.
Distribution: batch sharded over the mesh's data axis; gradient all-reduce
is emitted by XLA (replaces accelerate DDP/NCCL).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Iterable, Iterator, Mapping

import jax
import numpy as np

from edm_tts_tpu.models.codec.losses import ReconstructionLoss
from edm_tts_tpu.parallel.checkpoint import (
    CheckpointManager,
    detect_last_checkpoint,
    export_model,
)
from edm_tts_tpu.parallel.mesh import batch_sharding, make_mesh, param_shardings
from edm_tts_tpu.train.gan import TrainState, gan_eval_step, gan_train_step
from edm_tts_tpu.train.optim import adamw, exponential_schedule
from edm_tts_tpu.utils.logging import MetricLogger, logger


@dataclasses.dataclass
class GANTrainingArguments:
    output_dir: str
    seed: int = 42
    max_steps: int = 100_000
    logging_steps: int = 100
    eval_steps: int = 1000
    save_steps: int = 10_000
    save_total_limit: int = 2
    gen_lr: float = 1e-4
    disc_lr: float = 1e-4
    gen_betas: tuple[float, float] = (0.8, 0.99)
    disc_betas: tuple[float, float] = (0.8, 0.99)
    scheduler_gamma: float = 0.999996
    time_limit: str | None = None
    overwrite_output_dir: bool = False
    num_samples_to_log: int = 4
    # remote experiment trackers: "module.path:factory" specs (wandb analog)
    trackers: tuple[str, ...] = ()
    # Fence G and D optimizer updates on finite gradient norms (one corrupt
    # batch or an adversarial-loss blowup cannot poison either state; skips
    # surface as metrics["skipped_nonfinite"]). Off by default for recipe
    # parity — the reference has no such guard.
    skip_nonfinite_updates: bool = False
    # Per-tensor grad/param norm logging ("gradients" | "parameters" | "all");
    # the reference runs codec training under WANDB_WATCH=all
    # (run_codec_training.py:201). See train/watch.py.
    watch: str | None = None


class GANTrainer:
    def __init__(
        self,
        args: GANTrainingArguments,
        codec,
        disc,
        g_params,
        d_params,
        recon_loss: ReconstructionLoss,
        lambdas: Mapping[str, float] | None = None,
        mesh=None,
    ):
        self.args = args
        self.codec = codec
        self.disc = disc
        self.recon_loss = recon_loss
        self.lambdas = dict(lambdas) if lambdas else None
        self.mesh = mesh if mesh is not None else make_mesh()

        g_tx = adamw(
            exponential_schedule(args.gen_lr, args.scheduler_gamma),
            b1=args.gen_betas[0], b2=args.gen_betas[1], weight_decay=0.01,
        )
        d_tx = adamw(
            exponential_schedule(args.disc_lr, args.scheduler_gamma),
            b1=args.disc_betas[0], b2=args.disc_betas[1], weight_decay=0.01,
        )
        g_state = TrainState.create(apply_fn=None, params=g_params, tx=g_tx)
        d_state = TrainState.create(apply_fn=None, params=d_params, tx=d_tx)
        self.g_state = jax.tree_util.tree_map(
            jax.device_put, g_state, param_shardings(self.mesh, g_state)
        )
        self.d_state = jax.tree_util.tree_map(
            jax.device_put, d_state, param_shardings(self.mesh, d_state)
        )
        # Accidental-overwrite guard BEFORE any artifact is created in
        # output_dir (reference utils.py:30-46 semantics).
        detect_last_checkpoint(args.output_dir, args.overwrite_output_dir)
        self.ckpt = CheckpointManager(args.output_dir, args.save_total_limit)
        self.metrics = MetricLogger(args.output_dir, trackers=args.trackers)
        self._batch_sharding = batch_sharding(self.mesh)
        self.best_val_loss = float("inf")

    def _restore(self) -> int:
        latest = self.ckpt.latest_step()
        if latest is None or self.args.overwrite_output_dir:
            return 0
        (self.g_state, self.d_state), meta = self.ckpt.restore(
            latest, template=(self.g_state, self.d_state)
        )
        self.best_val_loss = meta.get("best_val_loss", float("inf"))
        logger.info("resumed GAN training from step %s", meta.get("step", latest))
        return int(meta.get("step", latest))

    def save(self, step: int):
        self.ckpt.save(
            step,
            (self.g_state, self.d_state),
            {"step": step, "best_val_loss": self.best_val_loss},
        )

    def export_best(self, config_json: str):
        export_model(
            f"{self.args.output_dir}/best_model", self.g_state.params, config_json
        )

    def train(
        self,
        train_iter: Iterator,
        eval_iter: Iterable | None = None,
        config_json: str = "{}",
    ):
        from edm_tts_tpu.train.preemption import PreemptionGuard

        with PreemptionGuard() as guard:
            self._guard = guard
            return self._train_loop(train_iter, eval_iter, config_json, guard)

    def _train_loop(self, train_iter, eval_iter, config_json, guard):
        args = self.args
        start = self._restore()
        step = start
        rng = jax.random.PRNGKey(args.seed)
        t0 = time.time()
        t_limit = None
        if args.time_limit:
            hh, mm = args.time_limit.split(":")
            t_limit = int(hh) * 3600 + int(mm) * 60
        last_log = time.time()

        for step in range(start, args.max_steps):
            audio = jax.device_put(next(train_iter), self._batch_sharding)
            step_rng = jax.random.fold_in(rng, step)
            with jax.profiler.StepTraceAnnotation("gan_train", step_num=step):
                self.g_state, self.d_state, metrics = gan_train_step(
                self.codec, self.disc, self.recon_loss,
                self.g_state, self.d_state, audio, step_rng, self.lambdas,
                args.skip_nonfinite_updates, args.watch,
            )
            if (step + 1) % args.logging_steps == 0:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                dt = time.time() - last_log
                last_log = time.time()
                m["steps_per_sec"] = args.logging_steps / dt
                self.metrics.log(step + 1, m, prefix="train/")
                logger.info("step %d G %.4f D %.4f", step + 1,
                            m.get("loss", 0.0), m.get("adv/disc_loss", 0.0))
            if eval_iter is not None and (step + 1) % args.eval_steps == 0:
                val = self.evaluate(eval_iter, log_audio_step=step + 1)
                self.metrics.log(step + 1, val, prefix="eval/")
                if val["mel_loss"] < self.best_val_loss:
                    self.best_val_loss = val["mel_loss"]
                    self.export_best(config_json)
            if (step + 1) % args.save_steps == 0:
                self.save(step + 1)
            if guard.triggered:
                logger.warning("preemption signal; saving at step %d", step + 1)
                break
            if t_limit is not None and time.time() - t0 > t_limit:
                logger.info("time limit; saving at step %d", step + 1)
                break
        self.save(min(step + 1, args.max_steps))
        return self.g_state, self.d_state

    def evaluate(self, eval_iter: Iterable, log_audio_step: int | None = None) -> dict:
        # a zero-arg factory yields a FRESH pass per eval; a bare generator
        # would be consumed by the first eval and silently NaN later ones
        # (real bug: the closed-loop rehearsal's step-200 eval)
        if callable(eval_iter):
            eval_iter = eval_iter()
        losses = []
        last_recon = last_real = None
        for audio in eval_iter:
            audio = jax.device_put(audio, self._batch_sharding)
            mel, recon = gan_eval_step(
                self.codec, self.recon_loss, self.g_state.params, audio
            )
            losses.append(float(mel))
            last_recon, last_real = recon, audio
        if log_audio_step is not None and last_recon is not None:
            self._log_audio_samples(log_audio_step, last_real, last_recon)
        # cross-process mean: every host sees the same mel loss, so the
        # best-model export decision (train loop) is globally consistent
        from edm_tts_tpu.parallel.dist import global_mean_metrics

        if not losses and jax.process_count() == 1:
            return {"mel_loss": float("nan")}
        return global_mean_metrics({"mel_loss": float(np.sum(losses))}, len(losses))

    def _log_audio_samples(self, step: int, real, recon):
        """Write eval reconstruction samples as wavs (the wandb.Audio logging
        analog — reference gan_trainer.py:250-265 logs the last gathered
        batch; same here)."""
        import os

        from edm_tts_tpu.data.audio_io import save_wav

        out_dir = os.path.join(self.args.output_dir, "samples", f"step_{step}")
        os.makedirs(out_dir, exist_ok=True)
        recon_np = np.asarray(recon)  # one device->host pull each
        real_np = np.asarray(real)
        n = min(self.args.num_samples_to_log, recon_np.shape[0])
        sr = self.codec.config.sample_rate
        for i in range(n):
            save_wav(os.path.join(out_dir, f"recon_{i}.wav"),
                     recon_np[i, :, 0], sr)
            save_wav(os.path.join(out_dir, f"real_{i}.wav"),
                     real_np[i, :, 0], sr)
            # wandb.Audio-analog remote hook (reference gan_trainer.py:250-265)
            self.metrics.log_audio(step, f"recon_{i}", recon_np[i, :, 0], sr)
