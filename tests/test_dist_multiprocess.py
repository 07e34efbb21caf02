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


_EVAL_WORKER = textwrap.dedent(
    """
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")
    pid, n, port, tmp = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=n,
        process_id=pid,
    )
    import jax.numpy as jnp
    import numpy as np

    from edm_tts_tpu.models.codec import Codec, CodecConfig
    from edm_tts_tpu.models.codec.discriminator import (
        Discriminator,
        DiscriminatorConfig,
    )
    from edm_tts_tpu.models.codec.losses import ReconstructionLoss
    from edm_tts_tpu.parallel.dist import all_gather_metrics
    from edm_tts_tpu.parallel.mesh import make_mesh
    from edm_tts_tpu.train.gan_trainer import GANTrainer, GANTrainingArguments

    cfg = CodecConfig(encoder_dim=4, decoder_dim=32, n_codebooks=2,
                      codebook_size=16, codebook_dim=4, quantizer_dropout=0.0)
    codec = Codec(cfg)
    disc = Discriminator(DiscriminatorConfig(periods=(2,), fft_sizes=(128,)))
    x = jnp.zeros((1, 640, 1))
    g = jax.jit(codec.init)(jax.random.PRNGKey(0), x)  # same params each rank
    d = jax.jit(disc.init)(jax.random.PRNGKey(1), x)
    recon = ReconstructionLoss(
        16000,
        mel_spectrogram_args={"n_mels": (5,), "window_lengths": (64,),
                              "mel_fmin": (0.0,), "mel_fmax": (None,)},
    )
    args = GANTrainingArguments(output_dir=f"{tmp}/rank{pid}", max_steps=1)
    mesh = make_mesh(1, 1, devices=jax.local_devices()[:1])
    tr = GANTrainer(args, codec, disc, g, d, recon, mesh=mesh)

    # each rank evaluates a DIFFERENT shard (different data AND batch count)
    rng = np.random.default_rng(100 + pid)
    batches = [0.1 * rng.standard_normal((1, 640, 1)).astype(np.float32)
               for _ in range(2 + pid)]
    val = tr.evaluate(batches)

    # every rank must report the identical global mel loss ...
    vals = all_gather_metrics(val["mel_loss"])
    assert abs(vals[0] - vals[1]) < 1e-9, vals
    # ... and hence make the identical best-model decision
    decisions = all_gather_metrics(float(val["mel_loss"] < 1.5))
    assert decisions[0] == decisions[1], decisions
    print(f"EVAL_WORKER_OK {pid} {val['mel_loss']:.6f}", flush=True)
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


@pytest.mark.slow
def test_two_process_eval_metrics_are_global(tmp_path):
    """Each rank evaluates a different eval shard yet both report the same
    (global) mel loss and best-model decision — the gather_for_metrics
    parity the reference gets from accelerate (gan_trainer.py:229-248)."""
    port = _free_port()
    worker = tmp_path / "eval_worker.py"
    worker.write_text(_EVAL_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed eval workers timed out")
        outs.append(out)
    reported = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        line = [l for l in out.splitlines() if l.startswith("EVAL_WORKER_OK")]
        assert line, out
        reported.append(line[0].split()[-1])
    assert reported[0] == reported[1], reported
