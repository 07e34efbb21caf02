"""Serving soak: sustained mixed-length traffic through the FULL HTTP stack.

VERDICT r4 #8: the lookahead batcher (serving/batcher.py) was built for
mixed-length traffic but had only ever run under short benchmark bursts.
This drives `TTSServer` (HTTP -> DynamicBatcher(lookahead=4) -> staged TPU
pipeline -> wav) for N sustained minutes with 4 concurrent clients whose
gt_lengths cycle a 2.56/5.12/7.68/10.24 s mix — the regime the lookahead
sort was shipped for — and watches for the soak failure modes:

  - queue growth (arrival rate exceeding service rate would diverge; the
    clients here are closed-loop so the check is depth staying ~bounded)
  - memory creep (VmRSS sampled every window; wav bytes + futures must not
    accumulate)
  - latency drift (per-window p50/p99 over completion-stamped latencies)
  - stats sanity (counters monotone, failures == 0)

Writes one JSONL line per 30 s window (committed artifact) + a summary.
The reference has no serving layer (its inference.py is a one-shot CLI);
this soaks the subsystem we added beyond parity.

Run on the chip: python benchmarks/serving_soak.py --minutes 12 \
    --out benchmarks/serving_soak_r5.jsonl
"""

import argparse
import http.client
import json
import sys
import threading
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from benchmarks.serving_throughput import build_engine

GTS = [128, 256, 384, 512]  # tokens at 50 Hz
TEXTS = ["short utterance.", "a medium length utterance for the soak.",
         "a somewhat longer utterance that the batcher will sort by length.",
         "the longest utterance class in the mix, ten point two four seconds."]


def _rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


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


def _get_stats(host, port):
    conn = http.client.HTTPConnection(host, port, timeout=60)
    conn.request("GET", "/stats")
    resp = conn.getresponse()
    s = json.loads(resp.read())
    conn.close()
    return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=12.0)
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--window_s", type=float, default=30.0)
    ap.add_argument("--out", default="benchmarks/serving_soak_r5.jsonl")
    args = ap.parse_args()

    from edm_tts_tpu.serving.server import TTSServer

    eng = build_engine()
    srv = TTSServer(eng, max_batch=16, max_wait_ms=10).start()
    host, port = srv.host, srv.port

    # warm the (batch bucket x length bucket) programs the mix will engage:
    # homogeneous-length batch-4/16 canvases + batch-1 strays
    for gt in GTS:
        eng.synthesize([TEXTS[0]] * 4, "bench", seed=0, gt_lengths=[gt] * 4)
    eng.synthesize([TEXTS[0]] * 16, "bench", seed=0, gt_lengths=[512] * 16)
    _post(host, port, {"text": TEXTS[0], "speaker": "bench", "seed": 0,
                       "gt_length": 128})

    stop = threading.Event()
    lock = threading.Lock()
    done = []  # (t_complete, latency_s, gt)

    def client(idx):
        rng = np.random.default_rng(idx)
        while not stop.is_set():
            j = int(rng.integers(0, len(GTS)))
            body = {"text": TEXTS[j], "speaker": "bench",
                    "seed": int(rng.integers(1 << 30)), "gt_length": GTS[j]}
            try:
                dt, _ = _post(host, port, body)
            except Exception:
                if stop.is_set():
                    return
                raise
            with lock:
                done.append((time.perf_counter(), dt, GTS[j]))

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(args.clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()

    windows = []
    rss0 = _rss_mb()
    deadline = t_start + args.minutes * 60
    prev = dict(n=0, completed=0)
    while time.perf_counter() < deadline:
        time.sleep(args.window_s)
        now = time.perf_counter()
        stats = _get_stats(host, port)
        with lock:
            recent = [(tc, dt, gt) for tc, dt, gt in done
                      if tc > now - args.window_s]
            n_total = len(done)
            audio_total = sum(gt for _, _, gt in done) / 50.0
        lats = np.array([dt for _, dt, _ in recent]) if recent else np.array([0.0])
        win = {
            "t_s": round(now - t_start, 1),
            "req_total": n_total,
            "req_window": len(recent),
            "audio_s_per_s": round(sum(g for _, _, g in recent) / 50.0
                                   / args.window_s, 2),
            "p50_s": round(float(np.percentile(lats, 50)), 3),
            "p99_s": round(float(np.percentile(lats, 99)), 3),
            "queue_depth": stats["queue_depth"],
            "mean_batch": round(stats["mean_batch"], 2),
            "failed": stats.get("failed", 0),
            "rss_mb": round(_rss_mb(), 1),
        }
        # monotone sanity
        assert stats["completed"] >= prev["completed"], (stats, prev)
        assert win["failed"] == 0, win
        prev = dict(n=n_total, completed=stats["completed"])
        windows.append(win)
        print(json.dumps(win), flush=True)

    stop.set()
    # let in-flight requests finish, then stop the stack
    time.sleep(15)
    srv.shutdown()

    with open(args.out, "w") as f:
        for w in windows:
            f.write(json.dumps(w) + "\n")

    steady = windows[1:] if len(windows) > 2 else windows
    p99s = [w["p99_s"] for w in steady]
    depths = [w["queue_depth"] for w in steady]
    rss_growth = windows[-1]["rss_mb"] - windows[0]["rss_mb"]
    print(f"# soak {args.minutes:.0f} min, {args.clients} clients: "
          f"{windows[-1]['req_total']} requests, "
          f"{audio_total:.0f} audio-s total")
    print(f"# p99 first->last window: {p99s[0]:.2f} -> {p99s[-1]:.2f} s; "
          f"max queue depth {max(depths)}; "
          f"RSS {windows[0]['rss_mb']:.0f} -> {windows[-1]['rss_mb']:.0f} MB "
          f"(+{rss_growth:.0f} MB, warm baseline {rss0:.0f})")
    assert max(depths) <= 4 * args.clients, "queue diverged"


if __name__ == "__main__":
    main()
