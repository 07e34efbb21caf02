"""Generic trainer: the HF-``Trainer``-equivalent loop, TPU-native.

Drives the s2a and t2s trainings the way the reference drives them through
``transformers.Trainer`` + DeepSpeed ZeRO-2 (run_semantic_to_acoustic_
training.py:203-220): cosine LR with warmup, grad clip, bf16, max-steps and
wall-time-limit stopping, periodic checkpoints with retention + auto-resume,
metric logging. Differences by design:

- ONE jitted train step over a ``Mesh`` (data x fsdp): gradients are
  all-reduced by XLA over ICI; optimizer state is sharded along ``fsdp``
  (the ZeRO analogue) simply by sharding the state pytree;
- callbacks are plain python on the host loop (EndTraining / TimeLimit
  parity with reference :94-121);
- explicit PRNG threading: the step key is folded from (seed, step).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Iterable, Iterator, Mapping

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from edm_tts_tpu.parallel.checkpoint import CheckpointManager, detect_last_checkpoint
from edm_tts_tpu.parallel.mesh import batch_sharding, make_mesh, param_shardings
from edm_tts_tpu.train.optim import adamw, warmup_cosine_schedule
from edm_tts_tpu.utils.logging import MetricLogger, logger


@dataclasses.dataclass
class TrainingArguments:
    output_dir: str
    seed: int = 42
    per_device_train_batch_size: int = 32
    max_steps: int = 100_000
    learning_rate: float = 3e-4
    warmup_steps: int = 4000
    # HF TrainingArguments defaults (weight_decay 0.0); the reference YAMLs
    # train s2a/t2s with betas (0.8, 0.99), wd 0.0 — set via the entry
    # scripts (configs/*/train_config.yaml:62-67 in the reference).
    weight_decay: float = 0.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 0.5
    logging_steps: int = 100
    eval_steps: int = 1000
    save_steps: int = 10_000
    save_total_limit: int = 2
    time_limit: str | None = None  # "hh:mm" wall clock, reference TimeLimitCallback
    overwrite_output_dir: bool = False
    resume_from_checkpoint: str | None = None
    n_fsdp: int = 1
    # Gradient accumulation: split each batch into this many microbatches and
    # lax.scan the fwd+bwd, summing mask-weighted grads. EXACT recipe math
    # when loss_fn reports its masked-token count as metrics["loss_weight"]:
    # sum_i(w_i * g_i) / sum_i(w_i) IS the full-batch masked-mean gradient.
    # Not the HF gradient_accumulation_steps (which trades steps for batch);
    # here it trades live activations for weight re-reads so the 464M s2a can
    # drop remat entirely: 855 -> 627 ms/step at B32x768 with micro_batches=4
    # (scripts/s2a_microbatch_crux.py ladder, benchmarks/README.md).
    micro_batches: int = 1
    # tensor-parallel axis size (megatron-sharded conformer matmuls,
    # parallel/mesh.py::_tp_spec_for); 1 = off
    n_model: int = 1
    # sequence-parallel (ring attention) axis size; >1 adds a `sequence`
    # mesh axis and requires the model be built with
    # attn_implementation="ring" (ops/ring_attention.py); 1 = off
    n_seq: int = 1
    # remote experiment trackers: "module.path:factory" specs (wandb analog,
    # reference report_to — see utils/logging.py Tracker)
    trackers: tuple[str, ...] = ()
    # Skip the optimizer update when the gradient norm is non-finite (one
    # corrupt batch cannot poison params/opt-state); the step counter still
    # advances so the LR schedule stays on time, and the skip is surfaced
    # as metrics["skipped_nonfinite"]. Default off for recipe parity: the
    # reference (HF Trainer + DeepSpeed bf16, configs/ds_config.json) has
    # no such guard.
    skip_nonfinite_updates: bool = False
    # Per-tensor grad/param norm logging: "gradients" | "parameters" | "all"
    # (the reference's WANDB_WATCH vocabulary, run_codec_training.py:201;
    # entry scripts read the WANDB_WATCH env var into this). Norms are
    # computed inside the jitted step and fetched only at logging_steps —
    # see train/watch.py for why norms, not histograms, on a TPU tunnel.
    watch: str | None = None

    def time_limit_seconds(self) -> float | None:
        if not self.time_limit:
            return None
        hh, mm = self.time_limit.split(":")
        return int(hh) * 3600 + int(mm) * 60


class TrainState(train_state.TrainState):
    pass


LossFn = Callable[..., tuple[jax.Array, Mapping[str, jax.Array]]]


class Trainer:
    """Generic masked-LM trainer.

    Args:
      loss_fn: ``loss_fn(params, batch, rng) -> (loss, metrics)``; must close
        over the model's ``apply``.
      init_params: initialized parameter pytree.
      frozen_mask: optional bool pytree (True = trainable) for frozen subtrees.
    """

    def __init__(
        self,
        args: TrainingArguments,
        loss_fn: LossFn,
        init_params: Any,
        *,
        frozen_mask: Any | None = None,
        eval_fn: Callable | None = None,
        mesh=None,
    ):
        self.args = args
        self.mesh = mesh if mesh is not None else make_mesh(
            n_fsdp=args.n_fsdp, n_model=args.n_model, n_seq=args.n_seq
        )
        schedule = warmup_cosine_schedule(
            args.learning_rate, args.warmup_steps, args.max_steps
        )
        tx = adamw(
            schedule,
            b1=args.adam_beta1,
            b2=args.adam_beta2,
            eps=args.adam_epsilon,
            weight_decay=args.weight_decay,
            grad_clip=args.max_grad_norm,
            frozen_mask=frozen_mask,
        )
        state = TrainState.create(apply_fn=None, params=init_params, tx=tx)
        shardings = param_shardings(self.mesh, state)
        self.state = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), state, shardings
        )
        self.loss_fn = loss_fn
        self.eval_fn = eval_fn
        # Accidental-overwrite guard BEFORE any artifact is created in
        # output_dir (reference calls detect_last_checkpoint in the entry
        # script ahead of Trainer construction, utils.py:30-46).
        detect_last_checkpoint(args.output_dir, args.overwrite_output_dir)
        self.ckpt = CheckpointManager(args.output_dir, args.save_total_limit)
        self.metrics = MetricLogger(args.output_dir, trackers=args.trackers)
        self._batch_sharding = batch_sharding(self.mesh)

        n_micro = max(1, args.micro_batches)

        def guarded_apply(state, grads, metrics):
            """apply_gradients, optionally fenced on grad-norm finiteness."""
            grad_norm = optax.global_norm(grads)
            metrics["grad_norm"] = grad_norm
            if args.watch:
                from edm_tts_tpu.train.watch import watch_metrics

                metrics.update(
                    watch_metrics(args.watch, grads=grads, params=state.params)
                )
            if not args.skip_nonfinite_updates:
                return state.apply_gradients(grads=grads), metrics
            finite = jnp.isfinite(grad_norm)
            # Always run the update, then select per leaf: integer leaves
            # (TrainState.step AND the optax counts inside opt_state — the
            # LR schedule reads the optax count, not state.step) advance
            # even on a skip so the schedule stays on time; float leaves
            # (params, mu/nu) keep their old values when the grad norm is
            # non-finite. `where` never propagates the NaN side it discards.
            updated = state.apply_gradients(grads=grads)
            new_state = jax.tree_util.tree_map(
                lambda old, new: new
                if jnp.issubdtype(jnp.asarray(new).dtype, jnp.integer)
                else jnp.where(finite, new, old),
                state,
                updated,
            )
            metrics["skipped_nonfinite"] = 1.0 - finite.astype(jnp.float32)
            return new_state, metrics

        def train_step(state: TrainState, batch, rng):
            def wrapped(params):
                loss, metrics = self.loss_fn(params, batch, rng)
                return loss, dict(metrics)

            (loss, metrics), grads = jax.value_and_grad(wrapped, has_aux=True)(
                state.params
            )
            metrics.pop("loss_weight", None)
            metrics["loss"] = loss
            new_state, metrics = guarded_apply(state, grads, metrics)
            return new_state, metrics

        def accum_train_step(state: TrainState, batch, rng):
            # (B, ...) -> (n_micro, B/n_micro, ...); the microbatch dim stays
            # sharded over `data` via the constraint inside the scan body, so
            # each microbatch still spans all data-parallel devices.
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((n_micro, x.shape[0] // n_micro) + x.shape[1:]),
                batch,
            )
            rngs = jax.random.split(rng, n_micro)

            def body(g_acc, inp):
                mb, r = inp
                mb = jax.tree_util.tree_map(
                    lambda x: jax.lax.with_sharding_constraint(
                        x, self._batch_sharding
                    ),
                    mb,
                )

                def wrapped(params):
                    loss, metrics = self.loss_fn(params, mb, r)
                    metrics = dict(metrics)
                    w = jnp.asarray(
                        metrics.pop("loss_weight", 1.0), jnp.float32
                    )
                    metrics["loss"] = loss
                    # d(loss*w)/dp = w * g (w is data, not params), so the
                    # grad of the scaled loss IS the weighted-sum term.
                    return loss * w, (metrics, w)

                (_, (metrics, w)), g = jax.value_and_grad(
                    wrapped, has_aux=True
                )(state.params)
                g_acc = jax.tree_util.tree_map(
                    lambda a, b: a + b.astype(a.dtype), g_acc, g
                )
                return g_acc, (metrics, w)

            g0 = jax.tree_util.tree_map(
                lambda x: jnp.zeros(x.shape, jnp.float32), state.params
            )
            g_sum, (stacked, w) = jax.lax.scan(body, g0, (micro, rngs))
            w_sum = jnp.sum(w)
            grads = jax.tree_util.tree_map(lambda x: x / w_sum, g_sum)
            metrics = {
                k: jnp.sum(w * v.astype(jnp.float32)) / w_sum
                for k, v in stacked.items()
            }
            new_state, metrics = guarded_apply(state, grads, metrics)
            return new_state, metrics

        self._train_step = jax.jit(
            accum_train_step if n_micro > 1 else train_step, donate_argnums=(0,)
        )

    # -- checkpointing -------------------------------------------------------
    def save(self, step: int, extra_meta: dict | None = None):
        meta = {"step": step}
        if extra_meta:
            meta.update(extra_meta)
        self.ckpt.save(step, self.state, meta)

    def _release_state_for_restore(self):
        """Swap the live train state for an abstract template and FREE its
        device buffers. Restoring with a concrete template transiently
        holds TWO copies of the state in HBM (plus fragmentation holes from
        the interleaved free/alloc) — observed live: the 464M s2a resume
        OOM'd its first post-restore step while a fresh run of the same
        recipe fits. Orbax restores into ShapeDtypeStruct templates with
        shardings directly, so the old buffers can be dropped up front."""
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            if isinstance(x, jax.Array) else x,
            self.state,
        )
        jax.tree_util.tree_map(
            lambda x: x.delete() if isinstance(x, jax.Array) else None,
            self.state,
        )
        self.state = None
        return abstract

    def maybe_resume(self) -> int:
        args = self.args
        step = None
        if args.resume_from_checkpoint:
            mgr = CheckpointManager(args.resume_from_checkpoint, None)
            self.state, meta = mgr.restore(
                template=self._release_state_for_restore()
            )
            step = meta.get("step", mgr.latest_step())
        elif not args.overwrite_output_dir:
            latest = self.ckpt.latest_step()
            if latest is not None:
                template = self._release_state_for_restore()
                self.state, meta = self.ckpt.restore(latest, template=template)
                step = meta.get("step", latest)
                logger.info("resumed from checkpoint step %s", step)
        return int(step or 0)

    # -- main loop -----------------------------------------------------------
    def train(self, train_iter: Iterator, eval_iter: Iterable | None = None):
        from edm_tts_tpu.train.preemption import PreemptionGuard

        with PreemptionGuard() as guard:
            self._guard = guard
            return self._train_loop(train_iter, eval_iter, guard)

    def _train_loop(self, train_iter, eval_iter, guard):
        args = self.args
        start_step = self.maybe_resume()
        rng = jax.random.PRNGKey(args.seed)
        t_start = time.time()
        t_limit = args.time_limit_seconds()
        step = start_step
        last_log = time.time()

        for step in range(start_step, args.max_steps):
            batch = next(train_iter)
            batch = jax.device_put(batch, self._batch_sharding)
            step_rng = jax.random.fold_in(rng, step)
            # trace/run under the mesh context so mesh-resolving ops
            # (ring attention) see it at trace time
            with jax.profiler.StepTraceAnnotation("train", step_num=step), self.mesh:
                self.state, metrics = self._train_step(self.state, batch, step_rng)

            if (step + 1) % args.logging_steps == 0:
                metrics = jax.device_get(metrics)
                dt = time.time() - last_log
                last_log = time.time()
                metrics["steps_per_sec"] = args.logging_steps / dt
                self.metrics.log(step + 1, metrics, prefix="train/")
                logger.info(
                    "step %d loss %.4f (%.2f steps/s)",
                    step + 1,
                    float(metrics["loss"]),
                    metrics["steps_per_sec"],
                )
            if self.eval_fn and eval_iter and (step + 1) % args.eval_steps == 0:
                eval_metrics = self.evaluate(eval_iter)
                self.metrics.log(step + 1, eval_metrics, prefix="eval/")
            if (step + 1) % args.save_steps == 0:
                self.save(step + 1)
            if guard.triggered:
                logger.warning(
                    "preemption signal: checkpointing at step %d and "
                    "stopping (resume picks this up)", step + 1,
                )
                self.save(step + 1)
                break
            if t_limit is not None and time.time() - t_start > t_limit:
                logger.info("time limit reached at step %d; saving and stopping", step + 1)
                self.save(step + 1)
                break
        else:
            step = args.max_steps - 1
        self.save(step + 1)
        return self.state

    def evaluate(self, eval_iter: Iterable) -> dict:
        assert self.eval_fn is not None
        totals: dict[str, float] = {}
        n = 0
        for batch in eval_iter:
            batch = jax.device_put(batch, self._batch_sharding)
            with self.mesh:
                out = jax.device_get(self.eval_fn(self.state.params, batch))
            for k, v in out.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            n += 1
        # cross-process mean so every host reports the same eval metrics
        # (reference gather_for_metrics, gan_trainer.py:229-248)
        from edm_tts_tpu.parallel.dist import global_mean_metrics

        return global_mean_metrics(totals, n)
