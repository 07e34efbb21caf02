"""Metrics/observability: JSONL metric log + optional TensorBoard, stdout,
plus a pluggable remote-tracker hook.

Replaces the reference's wandb wiring (SURVEY.md §5: accelerate trackers,
per-loss scalars like ``mel/loss`` / ``adv/disc_loss``, audio samples via
``wandb.Audio`` — reference gan_trainer.py:250-265, run_codec_training.py:
200-201). wandb is not available in this image, so the built-in sinks are: a
``metrics.jsonl`` stream (machine-readable, survives preemption),
TensorBoard event files via tensorboardX when present, and python logging.
Remote experiment tracking (wandb/mlflow/neptune/...) plugs in through the
``Tracker`` interface: pass instances to ``MetricLogger(trackers=...)`` or
name factories in training YAML (``trackers: ["my_pkg.trk:make"]`` — the
analog of the reference's ``report_to: [wandb]``) and every scalar dict and
eval audio sample is fanned out to them.
"""

from __future__ import annotations

import importlib
import json
import logging
import os
import sys
import time
from typing import Mapping, Protocol, Sequence, runtime_checkable

logger = logging.getLogger("edm_tts_tpu")


@runtime_checkable
class Tracker(Protocol):
    """Remote experiment tracker interface (wandb-analog plug point)."""

    def log_scalars(self, step: int, scalars: Mapping[str, float]) -> None: ...

    def log_audio(
        self, step: int, name: str, waveform, sample_rate: int
    ) -> None: ...

    def close(self) -> None: ...


def tracker_from_spec(spec: str) -> Tracker:
    """Instantiate a tracker from a ``"module.path:factory"`` string.

    The factory is called with no arguments and must return a ``Tracker``.
    This is how YAML configs name remote trackers without this package
    importing them unconditionally."""
    module, _, factory = spec.partition(":")
    fn = getattr(importlib.import_module(module), factory or "make_tracker")
    return fn()


def setup_logging(level=logging.INFO) -> logging.Logger:
    logging.basicConfig(
        format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
        datefmt="%m/%d/%Y %H:%M:%S",
        handlers=[logging.StreamHandler(sys.stdout)],
        level=level,
    )
    return logger


class MetricLogger:
    def __init__(
        self,
        output_dir: str,
        use_tensorboard: bool = True,
        trackers: Sequence[Tracker | str] = (),
    ):
        os.makedirs(output_dir, exist_ok=True)
        self._jsonl = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        self._tb = None
        self.trackers = [
            tracker_from_spec(t) if isinstance(t, str) else t for t in trackers
        ]
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(output_dir, "tb"))
            except Exception:  # pragma: no cover
                self._tb = None

    def add_tracker(self, tracker: Tracker) -> None:
        self.trackers.append(tracker)

    def log(self, step: int, metrics: Mapping[str, float], prefix: str = "") -> None:
        record = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            key = f"{prefix}{k}"
            try:
                record[key] = float(v)
            except (TypeError, ValueError):
                continue
            if self._tb is not None:
                self._tb.add_scalar(key, record[key], step)
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        scalars = {k: v for k, v in record.items() if k not in ("step", "time")}
        for t in self.trackers:
            self._safe(t, "log_scalars", step, scalars)

    def log_audio(self, step: int, name: str, waveform, sample_rate: int) -> None:
        """Fan an eval audio sample out to remote trackers (wandb.Audio
        analog). The on-disk wav export is the trainer's job; this hook is
        only the remote-tracking path."""
        for t in self.trackers:
            self._safe(t, "log_audio", step, name, waveform, sample_rate)

    def _safe(self, tracker, method, *args):
        """Remote trackers must never kill a training run: the durable sinks
        (jsonl/TB) are already written when these fire."""
        try:
            getattr(tracker, method)(*args)
        except Exception:  # pragma: no cover - tracker-dependent
            logger.warning(
                "tracker %r failed in %s (ignored)", tracker, method,
                exc_info=True,
            )

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        for t in self.trackers:
            self._safe(t, "close")
