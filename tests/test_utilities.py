"""Utility-surface tests: libriheavy manifests + chunker, k-means, MSD,
process sharding, trainer time limit."""

import gzip
import json

import jax
import jax.numpy as jnp
import numpy as np

from tests.flac_encoder import encode_flac


def _write_libriheavy(tmp_path, n_cuts=3):
    sr = 16000
    rec_dir = tmp_path / "recs"
    rec_dir.mkdir()
    t = np.arange(sr * 2) / sr
    wav = (0.2 * np.sin(2 * np.pi * 300 * t) * 32767).astype(np.int64)
    (rec_dir / "rec0.flac").write_bytes(
        encode_flac(wav[None], sample_rate=sr, subframe_kind="fixed", order=2,
                    param=12)
    )
    man_dir = tmp_path / "libriheavy" / "small"
    man_dir.mkdir(parents=True)
    cuts = []
    for i in range(n_cuts):
        cuts.append({
            "id": f"cut{i}",
            "start": 0.1 * i,
            "duration": 0.5,
            "recording": {"id": "recs/rec0", "sampling_rate": sr},
            "supervisions": [{"custom": {"texts": [f"Hello, world {i}!"]}}],
        })
    with gzip.open(man_dir / "cuts.0.jsonl.gz", "wt") as f:
        for c in cuts:
            f.write(json.dumps(c) + "\n")
    return tmp_path


def test_libriheavy_manifest(tmp_path):
    from edm_tts_tpu.data.manifests import libriheavy_manifest

    _write_libriheavy(tmp_path)
    items = list(libriheavy_manifest(str(tmp_path), "small"))
    assert len(items) == 3
    it = items[1]
    assert it["offset"] == int(0.1 * 16000)
    assert it["num_frames"] == 8000
    assert it["no_punc_transcription"] == "HELLO WORLD 1"
    assert it["transcription"] == "Hello, world 1!"
    assert it["transcription_bytes"] == list(b"Hello, world 1!")
    assert it["file"].endswith("recs/rec0.flac")


def test_chunk_jsonl_gz(tmp_path):
    from edm_tts_tpu.data.manifests import chunk_jsonl_gz

    src = tmp_path / "big.jsonl.gz"
    with gzip.open(src, "wt") as f:
        for i in range(25):
            f.write(json.dumps({"i": i}) + "\n")
    out = tmp_path / "chunks"
    chunk_jsonl_gz(str(src), str(out), lines_per_chunk=10)
    files = sorted(out.glob("*.jsonl.gz"))
    assert len(files) == 3
    total = []
    for fpath in files:
        with gzip.open(fpath, "rt") as f:
            total += [json.loads(l)["i"] for l in f]
    assert total == list(range(25))


def test_kmeans_recovers_clusters():
    from edm_tts_tpu.ops.kmeans import kmeans

    rng = np.random.default_rng(0)
    centers_true = np.array([[0, 0], [10, 10], [-10, 10], [10, -10]], float)
    x = np.concatenate([
        c + 0.3 * rng.standard_normal((200, 2)) for c in centers_true
    ])
    centers, inertia = kmeans(jnp.asarray(x), 4, niter=10, nredo=3, seed=0)
    centers = np.asarray(centers)
    # each true center has a learned center nearby
    for c in centers_true:
        d = np.linalg.norm(centers - c, axis=-1).min()
        assert d < 0.5
    assert float(inertia) < 200.0


def test_msd_discriminator_with_resample():
    from edm_tts_tpu.models.codec.discriminator import MSD

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4000, 1)) * 0.1
    msd = MSD(rate=2, sample_rate=16000)
    params = jax.jit(msd.init)(jax.random.PRNGKey(1), x)
    fmaps = msd.apply(params, x)
    assert len(fmaps) == 7
    assert fmaps[0].shape[1] == 2000  # resampled to half rate
    assert np.isfinite(np.asarray(fmaps[-1])).all()


def test_shard_for_process():
    from edm_tts_tpu.data.pipeline import shard_for_process

    items = list(range(10))
    shards = [list(shard_for_process(items, r, 3)) for r in range(3)]
    assert sorted(sum(shards, [])) == items
    assert shards[0] == [0, 3, 6, 9]


def test_trainer_time_limit(tmp_path):
    from edm_tts_tpu.train.trainer import TrainingArguments

    args = TrainingArguments(output_dir=str(tmp_path), time_limit="01:30")
    assert args.time_limit_seconds() == 5400
    args2 = TrainingArguments(output_dir=str(tmp_path))
    assert args2.time_limit_seconds() is None
