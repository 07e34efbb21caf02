"""Preemption-safe training: checkpoint on SIGTERM.

TPU pods (and most cluster schedulers) deliver SIGTERM with a grace window
before eviction/maintenance. The reference relies on DeepSpeed's periodic
checkpoints and loses up to ``save_steps`` of work on preemption
(/root/reference/configs/ds_config.json — no signal handling anywhere in
the repo); here both trainers wrap their step loop in a
:class:`PreemptionGuard` and cut a final checkpoint the moment a signal
lands, so a preempted run resumes from the exact step it was killed at
(auto-resume already picks up the latest checkpoint).

The handler only sets a flag — the loop finishes the in-flight step and
saves from well-defined state; no checkpoint is ever written from inside a
signal handler. Installing handlers is only possible in the main thread;
elsewhere (e.g. trainers driven from a serving thread) the guard degrades
to a no-op flag that can still be set programmatically via ``trigger()``.
"""

from __future__ import annotations

import logging
import signal
import threading

logger = logging.getLogger(__name__)


class PreemptionGuard:
    """Context manager: latch SIGTERM (configurable) into a poll-able flag.

    Usage::

        with PreemptionGuard() as guard:
            for step in range(...):
                train_step(...)
                if guard.triggered:
                    save(step); break
    """

    def __init__(self, signals: tuple = (signal.SIGTERM,)):
        self._signals = signals
        self._flag = threading.Event()
        self._prev: dict = {}

    def __enter__(self) -> "PreemptionGuard":
        try:
            for s in self._signals:
                self._prev[s] = signal.signal(s, self._handle)
        except ValueError:
            # not the main thread: signals cannot be installed; the guard
            # still works via trigger()
            logger.debug("PreemptionGuard inactive (not main thread)")
        return self

    def __exit__(self, *exc) -> None:
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        self._prev.clear()

    def _handle(self, signum, frame) -> None:
        logger.warning("signal %s received: checkpointing at next step", signum)
        self._flag.set()

    def trigger(self) -> None:
        """Programmatic preemption (tests, external watchdogs)."""
        self._flag.set()

    @property
    def triggered(self) -> bool:
        return self._flag.is_set()
