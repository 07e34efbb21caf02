"""Pluggable experiment-tracker hook (wandb analog; utils/logging.py).

Reference surface: accelerate trackers + wandb.Audio sample logging
(reference gan_trainer.py:56-60, 250-265; run_codec_training.py:200-201).
"""

import sys
import types

import numpy as np

from edm_tts_tpu.utils.logging import MetricLogger, Tracker, tracker_from_spec


class FakeTracker:
    def __init__(self):
        self.scalars = []
        self.audio = []
        self.closed = False

    def log_scalars(self, step, scalars):
        self.scalars.append((step, dict(scalars)))

    def log_audio(self, step, name, waveform, sample_rate):
        self.audio.append((step, name, np.asarray(waveform).shape, sample_rate))

    def close(self):
        self.closed = True


def test_metric_logger_fans_out_to_trackers(tmp_path):
    trk = FakeTracker()
    assert isinstance(trk, Tracker)  # runtime-checkable protocol
    ml = MetricLogger(str(tmp_path), use_tensorboard=False, trackers=[trk])
    ml.log(7, {"mel/loss": 1.5, "adv/disc_loss": 0.25}, prefix="train/")
    ml.log_audio(7, "recon_0", np.zeros(160), 16000)
    ml.close()

    assert trk.scalars == [
        (7, {"train/mel/loss": 1.5, "train/adv/disc_loss": 0.25})
    ]
    assert trk.audio == [(7, "recon_0", (160,), 16000)]
    assert trk.closed
    # jsonl sink still written alongside
    assert (tmp_path / "metrics.jsonl").read_text().count('"step": 7') == 1


def test_tracker_from_spec_resolves_module_factory(tmp_path):
    mod = types.ModuleType("_fake_tracker_mod")
    made = {}

    def make_tracker():
        made["yes"] = True
        return FakeTracker()

    mod.make_tracker = make_tracker
    mod.custom = make_tracker
    sys.modules["_fake_tracker_mod"] = mod
    try:
        t = tracker_from_spec("_fake_tracker_mod:custom")
        assert isinstance(t, FakeTracker)
        # default factory name
        t2 = tracker_from_spec("_fake_tracker_mod")
        assert isinstance(t2, FakeTracker)
        # string specs accepted by MetricLogger directly (the YAML path)
        ml = MetricLogger(str(tmp_path), use_tensorboard=False,
                          trackers=["_fake_tracker_mod:custom"])
        assert isinstance(ml.trackers[0], FakeTracker)
        ml.close()
    finally:
        del sys.modules["_fake_tracker_mod"]
