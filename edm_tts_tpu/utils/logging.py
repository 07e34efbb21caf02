"""Metrics/observability: JSONL metric log + optional TensorBoard, stdout.

Replaces the reference's wandb wiring (SURVEY.md §5: accelerate trackers,
per-loss scalars like ``mel/loss`` / ``adv/disc_loss``, gradient watching).
wandb is not available in this image, so the sinks are: a ``metrics.jsonl``
stream (machine-readable, survives preemption), TensorBoard event files via
tensorboardX when present, and python logging.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Mapping

logger = logging.getLogger("edm_tts_tpu")


def setup_logging(level=logging.INFO) -> logging.Logger:
    logging.basicConfig(
        format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
        datefmt="%m/%d/%Y %H:%M:%S",
        handlers=[logging.StreamHandler(sys.stdout)],
        level=level,
    )
    return logger


class MetricLogger:
    def __init__(self, output_dir: str, use_tensorboard: bool = True):
        os.makedirs(output_dir, exist_ok=True)
        self._jsonl = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(output_dir, "tb"))
            except Exception:  # pragma: no cover
                self._tb = None

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

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
