"""Single-request serving latency: what ONE client sees, end to end.

The throughput benchmark (serving_throughput.py) answers "how much audio per
wall second at 16-way concurrency"; this one answers the complementary SLO
question: request-to-wav wall latency for a single HTTP POST /synthesize
(compile-warm, batch-1 — the interactive case), p50/p99 over repeated
requests, both idle and under light background load (a second client
issuing requests back-to-back, so some requests coalesce into batch-2
dispatches and others queue behind a foreign dispatch — the realistic
light-traffic regime). The reference's serving story is a hand-run CLI
(/root/reference/inference.py) with per-run process + compile cost; its
"latency" is minutes. Ours is the full stack: HTTP parse -> batcher queue
(max_wait_ms window) -> staged TPU pipeline -> wav encode -> HTTP body.

Run on the chip: python benchmarks/serving_latency.py
"""

import http.client
import json
import sys
import threading
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from benchmarks.common import report
from benchmarks.serving_throughput import build_engine

GT = 500  # ~10 s of audio at 50 Hz
TEXT = "a single interactive request measuring serving latency."


def _post(host, port, body, timeout=600.0):
    conn = http.client.HTTPConnection(host, port, timeout=timeout)
    t0 = time.perf_counter()
    conn.request("POST", "/synthesize", json.dumps(body),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    dt = time.perf_counter() - t0
    conn.close()
    assert resp.status == 200, (resp.status, data[:200])
    return dt, len(data)


def _pcts(xs):
    xs = np.sort(np.asarray(xs))
    return (float(np.percentile(xs, 50)), float(np.percentile(xs, 99)),
            float(xs.mean()))


def main():
    from edm_tts_tpu.serving.server import TTSServer

    eng = build_engine()
    srv = TTSServer(eng, max_batch=16, max_wait_ms=5).start()
    host, port = srv.host, srv.port
    body = {"text": TEXT, "speaker": "bench", "seed": 1, "gt_length": GT}

    # warm: batch-1 and batch-2 bucket programs both get compiled up front
    _post(host, port, body)
    eng.synthesize([TEXT, TEXT], "bench", seed=0, gt_lengths=[GT, GT])

    # --- idle: one client, sequential requests -----------------------------
    idle = [_post(host, port, body)[0] for _ in range(40)]
    p50_i, p99_i, mean_i = _pcts(idle)

    # --- light load: one background client at full tilt --------------------
    stop = threading.Event()

    def bg():
        b = dict(body, seed=2)
        while not stop.is_set():
            _post(host, port, b)

    t = threading.Thread(target=bg, daemon=True)
    t.start()
    try:
        loaded = [_post(host, port, body)[0] for _ in range(40)]
    finally:
        stop.set()
        t.join(timeout=600)
    p50_l, p99_l, mean_l = _pcts(loaded)

    srv.shutdown()
    report("serving_latency_p50_idle_ms", p50_i * 1e3, "ms", baseline=None)
    print(f"# idle    (40 reqs, 10s utterance): p50 {p50_i * 1e3:.1f} ms  "
          f"p99 {p99_i * 1e3:.1f} ms  mean {mean_i * 1e3:.1f} ms")
    print(f"# 2-way   (40 reqs, bg client):     p50 {p50_l * 1e3:.1f} ms  "
          f"p99 {p99_l * 1e3:.1f} ms  mean {mean_l * 1e3:.1f} ms")
    print(f"# RTF at p50 idle: {p50_i / (GT / 50):.4f}")


if __name__ == "__main__":
    main()
