"""Multi-process distributed smoke: 2 real CPU processes wired through
``jax.distributed`` exercise barrier / process_allgather / process-sharded
data loading — executable evidence for the dump-job sharding story
(reference dump_tokens.py:152-179,253: per-rank dataloaders +
``wait_for_everyone``)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=n,
        process_id=pid,
    )
    from edm_tts_tpu.data.pipeline import shard_for_process
    from edm_tts_tpu.parallel.dist import (
        all_gather_metrics,
        barrier,
        process_info,
    )

    rank, count = process_info()
    assert (rank, count) == (pid, n), (rank, count)

    barrier()

    vals = all_gather_metrics(float(rank) + 1.0)
    assert vals.tolist() == [1.0, 2.0], vals

    # process-sharded data loading: each rank takes a disjoint slice
    mine = list(shard_for_process(range(10), rank, count))
    expect = [i for i in range(10) if i % n == rank]
    assert mine == expect, (mine, expect)

    barrier()
    print(f"WORKER_OK {rank}", flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_barrier_allgather_and_sharding(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via config update
    env["PYTHONPATH"] = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, out
