"""Serving layer: TTSEngine (bucketed batch synthesis) + DynamicBatcher
(request coalescing). Engine correctness hinges on batch-pad independence —
a request's audio must not depend on which bucket its batch landed in —
and the batcher must coalesce, group by speaker, propagate failures, and
shut down cleanly.
"""

import queue
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tts_tpu.serving import DynamicBatcher, Request, TTSEngine
from edm_tts_tpu.utils.bucketing import bucket_batch, bucket_length


# ---------------------------------------------------------------- bucketing
def test_bucket_batch():
    assert bucket_batch(1, (1, 2, 4, 8)) == 1
    assert bucket_batch(3, (1, 2, 4, 8)) == 4
    assert bucket_batch(8, (8, 4, 2, 1)) == 8  # order-insensitive
    with pytest.raises(ValueError):
        bucket_batch(9, (1, 2, 4, 8))


# ---------------------------------------------------------------- batcher
class _FakeSynth:
    """Counts calls; returns per-text dummy 'waveforms'."""

    def __init__(self, fail_speaker=None):
        self.calls = []
        self.fail_speaker = fail_speaker
        self.block = threading.Event()
        self.block.set()

    def __call__(self, texts, speaker, *, seed=0, gt_lengths=None):
        self.block.wait()
        self.calls.append((tuple(texts), speaker, seed))
        if speaker == self.fail_speaker:
            raise RuntimeError("bad speaker")
        return [f"{speaker}:{t}" for t in texts]


def test_batcher_coalesces_and_groups():
    synth = _FakeSynth()
    synth.block.clear()  # hold the worker so all submits land in one window
    b = DynamicBatcher(synth, max_batch=8, max_wait_ms=200)
    futs = [
        b.submit(Request("a", "spk1")),
        b.submit(Request("b", "spk1")),
        b.submit(Request("c", "spk2")),
    ]
    synth.block.set()
    assert futs[0].result(10) == "spk1:a"
    assert futs[1].result(10) == "spk1:b"
    assert futs[2].result(10) == "spk2:c"
    b.close()
    # 2 calls: spk1 requests coalesced into one batch, spk2 separate
    speakers = sorted(c[1] for c in synth.calls)
    assert speakers == ["spk1", "spk2"]
    spk1_call = next(c for c in synth.calls if c[1] == "spk1")
    assert spk1_call[0] == ("a", "b")


def test_batcher_splits_mixed_gt_lengths():
    """A window mixing explicit-gt_length and predicted-length requests
    splits into two engine calls — the explicit lengths are honored, not
    silently dropped (gt_lengths is all-or-nothing per call)."""
    seen = []

    def synth(texts, speaker, *, seed=0, gt_lengths=None):
        seen.append((tuple(texts), gt_lengths))
        return [f"{t}:{g}" for t, g in zip(
            texts, gt_lengths or [None] * len(texts)
        )]

    b = DynamicBatcher(synth, max_batch=8, max_wait_ms=200)
    f1 = b.submit(Request("a", "s", gt_length=50))
    f2 = b.submit(Request("b", "s"))
    f3 = b.submit(Request("c", "s", gt_length=70))
    assert f1.result(10) == "a:50"
    assert f2.result(10) == "b:None"
    assert f3.result(10) == "c:70"
    b.close()
    # every engine call is all-or-nothing on gt_lengths, and both explicit
    # lengths reached the engine (regardless of window composition)
    assert all(
        g is None or all(x is not None for x in g) for _, g in seen
    )
    assert sorted(
        x for _, g in seen if g is not None for x in g
    ) == [50, 70]


def test_batcher_respects_max_batch():
    synth = _FakeSynth()
    synth.block.clear()
    b = DynamicBatcher(synth, max_batch=2, max_wait_ms=200)
    futs = [b.submit(Request(str(i), "s")) for i in range(5)]
    synth.block.set()
    for f in futs:
        f.result(10)
    b.close()
    assert all(len(c[0]) <= 2 for c in synth.calls)
    assert sum(len(c[0]) for c in synth.calls) == 5


def test_batcher_length_sorted_chunks():
    """Backlog drain + length-aware chunking: with lookahead > 1 the worker
    drains the queued backlog, sorts by gt_length, and cuts homogeneous
    max_batch chunks — short requests stop riding long canvases
    (scripts/profile_lengthmix.py measured 1.29x on a realistic mix)."""
    synth = _FakeSynth()
    synth.block.clear()  # hold the worker so all submits form one backlog
    b = DynamicBatcher(synth, max_batch=2, max_wait_ms=200, lookahead=4)
    lens = [500, 128, 500, 128, 500, 128, 500, 128]
    futs = [b.submit(Request(str(i), "s", gt_length=g))
            for i, g in enumerate(lens)]
    synth.block.set()
    for f in futs:
        f.result(10)
    b.close()
    gt_calls = sorted(
        tuple(sorted(int(t) for t in c[0])) for c in synth.calls
    )
    # chunks must be length-homogeneous: the 128s (reqs 1,3,5,7) together,
    # the 500s (0,2,4,6) together, in max_batch=2 slices
    by_len = {128: {1, 3, 5, 7}, 500: {0, 2, 4, 6}}
    for call in gt_calls:
        lengths = {lens[i] for i in call}
        assert len(lengths) == 1, f"mixed-length chunk: {call}"
        assert set(call) <= by_len[lengths.pop()]
    assert all(len(c[0]) <= 2 for c in synth.calls)
    assert sum(len(c[0]) for c in synth.calls) == 8


def test_batcher_lookahead_1_unchanged():
    """lookahead=1 reproduces the legacy behavior: no backlog drain, batch
    window only."""
    synth = _FakeSynth()
    synth.block.clear()
    b = DynamicBatcher(synth, max_batch=2, max_wait_ms=200, lookahead=1)
    futs = [b.submit(Request(str(i), "s")) for i in range(5)]
    synth.block.set()
    for f in futs:
        f.result(10)
    b.close()
    assert all(len(c[0]) <= 2 for c in synth.calls)
    assert sum(len(c[0]) for c in synth.calls) == 5


def test_batcher_failure_isolated_to_requests():
    synth = _FakeSynth(fail_speaker="bad")
    b = DynamicBatcher(synth, max_batch=4, max_wait_ms=50)
    ok = b.submit(Request("x", "good"))
    bad = b.submit(Request("y", "bad"))
    assert ok.result(10) == "good:x"
    with pytest.raises(RuntimeError, match="bad speaker"):
        bad.result(10)
    # the server survives: new requests still work
    assert b.submit(Request("z", "good")).result(10) == "good:z"
    b.close()


def test_batcher_close_rejects_and_backpressure():
    synth = _FakeSynth()
    b = DynamicBatcher(synth, max_batch=4, max_wait_ms=10, max_queue=2)
    b.close()
    with pytest.raises(RuntimeError):
        b.submit(Request("x", "s"))

    synth2 = _FakeSynth()
    synth2.block.clear()
    b2 = DynamicBatcher(synth2, max_batch=1, max_wait_ms=10, max_queue=2)
    # worker takes one request off the queue and blocks inside synth; two
    # more fill the bounded queue; the next submit must backpressure
    b2.submit(Request("0", "s"))
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline:
        try:
            b2.submit(Request("fill", "s"))
        except queue.Full:
            break
        time.sleep(0.01)
    else:
        pytest.fail("queue never filled")
    synth2.block.set()
    b2.close()


# ---------------------------------------------------------------- engine
@pytest.fixture(scope="module")
def tiny_model_dirs(tmp_path_factory):
    from test_e2e import TINY_CODEC, TINY_S2A, TINY_T2S
    from edm_tts_tpu.models.codec import Codec
    from edm_tts_tpu.models.hubert import HubertModel
    from edm_tts_tpu.models.hubert.config import HubertConfig
    from edm_tts_tpu.models.s2a import InjectionConformer
    from edm_tts_tpu.models.t2s import TextToSemantic
    from edm_tts_tpu.utils.hub import (
        save_codec,
        save_hubert,
        save_s2a,
        save_t2s,
    )

    tmp = tmp_path_factory.mktemp("serving_models")
    rng = jax.random.PRNGKey(0)
    codec = Codec(TINY_CODEC)
    codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 640, 1)))
    save_codec(str(tmp / "codec"), codec, codec_params)

    hub_cfg = HubertConfig(
        conv_dim=(8,) * 7, conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_stride=(5, 2, 2, 2, 2, 2, 2), hidden_size=16,
        num_hidden_layers=1, num_attention_heads=4, intermediate_size=32,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    )
    hub = HubertModel(hub_cfg)
    hub_params = jax.jit(hub.init)(rng, jnp.zeros((1, 1280)))
    centers = jax.random.normal(rng, (TINY_S2A.num_semantic_tokens, 16))
    save_hubert(str(tmp / "hubert"), hub_cfg, hub_params, centers)

    s2a = InjectionConformer(TINY_S2A)
    s2a_params = jax.jit(
        lambda r: s2a.init(
            r, jnp.zeros((1, 4, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32),
            mask_rng=r, train=False,
        )
    )(rng)
    s2a_params = {
        "params": {**s2a_params["params"], "codec": codec_params["params"]}
    }
    save_s2a(str(tmp / "s2a"), s2a, s2a_params)

    t2s = TextToSemantic(TINY_T2S)
    t2s_params = jax.jit(
        lambda r: t2s.init(
            r, jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool),
            jnp.zeros((1, 16), bool), jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1, 4), bool), jnp.ones((1,)),
            mask_rng=r, train=False,
        )
    )(rng)
    save_t2s(str(tmp / "t2s"), t2s, t2s_params)
    return tmp


@pytest.fixture(scope="module")
def tiny_engine(tiny_model_dirs):
    tmp = tiny_model_dirs
    eng = TTSEngine(
        str(tmp / "codec"), str(tmp / "t2s"), str(tmp / "s2a"),
        str(tmp / "hubert"), dtype=jnp.float32, pred_iters=2, s2a_steps=2,
        max_speech_len=16, text_bucket=8, length_bucket=8,
        batch_buckets=(1, 2, 4),
    )
    wav = (np.random.default_rng(0).standard_normal(3200) * 0.1).astype(
        np.float32
    )
    eng.register_speaker("alice", wav, eng.sample_rate)
    return eng


@pytest.mark.slow
def test_serve_cli_build(tiny_model_dirs):
    """serve.py builds a working server from exported model dirs (the
    deployment CLI path); health endpoint answers, graceful shutdown."""
    import argparse
    import json
    import urllib.request

    import serve

    tmp = tiny_model_dirs
    args = argparse.Namespace(
        codec_model=str(tmp / "codec"), t2s_model=str(tmp / "t2s"),
        s2a_model=str(tmp / "s2a"), hubert_model=str(tmp / "hubert"),
        speaker=None, host="127.0.0.1", port=0, max_batch=4,
        max_wait_ms=10.0, batch_lookahead=2, pred_iters=2, s2a_steps=2,
        temperature=1.0, max_speech_len=16, dtype="float32",
        quantize="none", quantize_t2s=None, quantize_s2a=None,
    )
    srv = serve.build_server(args).start()
    try:
        with urllib.request.urlopen(
            f"http://{srv.host}:{srv.port}/healthz", timeout=30
        ) as r:
            assert json.loads(r.read())["ok"]
    finally:
        srv.shutdown()


@pytest.mark.slow
def test_engine_synthesize_batch(tiny_engine):
    wavs = tiny_engine.synthesize(
        ["hello", "hey"], "alice", seed=3, gt_lengths=[10, 6]
    )
    assert len(wavs) == 2
    ds = tiny_engine.tokenizer.downsample_factor
    assert wavs[0].shape == (10 * ds,)
    assert wavs[1].shape == (6 * ds,)
    assert all(np.isfinite(w).all() for w in wavs)
    # deterministic per (texts, seed)
    again = tiny_engine.synthesize(
        ["hello", "hey"], "alice", seed=3, gt_lengths=[10, 6]
    )
    np.testing.assert_array_equal(wavs[0], again[0])


@pytest.mark.slow
def test_engine_from_models_precomputed_prompt():
    """The in-memory construction path (serve straight off training state,
    no export round-trip, no HuBERT): TTSEngine.from_models with a
    codec-only tokenizer + register_speaker_codes."""
    from test_e2e import TINY_CODEC, TINY_S2A, TINY_T2S
    from edm_tts_tpu.models.codec import Codec
    from edm_tts_tpu.models.s2a import InjectionConformer
    from edm_tts_tpu.models.t2s import TextToSemantic
    from edm_tts_tpu.models.tokenizer.audio_tokenizer import AudioTokenizer

    rng = jax.random.PRNGKey(0)
    codec = Codec(TINY_CODEC)
    codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 640, 1)))
    s2a = InjectionConformer(TINY_S2A)
    s2a_params = jax.jit(
        lambda r: s2a.init(
            r, jnp.zeros((1, 4, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32),
            mask_rng=r, train=False,
        )
    )(rng)
    s2a_params = {
        "params": {**s2a_params["params"], "codec": codec_params["params"]}
    }
    t2s = TextToSemantic(TINY_T2S)
    t2s_params = jax.jit(
        lambda r: t2s.init(
            r, jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool),
            jnp.zeros((1, 16), bool), jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1, 4), bool), jnp.ones((1,)),
            mask_rng=r, train=False,
        )
    )(rng)

    eng = TTSEngine.from_models(
        AudioTokenizer(codec, None), codec_params, None,
        s2a, s2a_params, t2s, t2s_params,
        pred_iters=2, s2a_steps=2, max_speech_len=16, text_bucket=8,
        length_bucket=8, batch_buckets=(1, 2),
    )
    k1, k2 = jax.random.split(rng)
    eng.register_speaker_codes(
        "p",
        jax.random.randint(k1, (1, 4, 10), 0, TINY_CODEC.codebook_size),
        jax.random.randint(k2, (1, 10), 0, TINY_S2A.num_semantic_tokens),
    )
    wavs = eng.synthesize(["hello"], "p", seed=0, gt_lengths=[8])
    assert wavs[0].shape == (8 * eng.tokenizer.downsample_factor,)
    assert np.isfinite(wavs[0]).all()


@pytest.mark.slow
def test_engine_dp_mesh_matches_single_device():
    """Multi-chip serving: an engine on a (data=4) mesh shards each batch
    over the devices and produces the same audio as the single-device
    engine (same bucket, same PRNG; float-tolerance — the partitioned
    programs fuse differently than the single-device ones, unlike the
    fused one-dispatch path of test_sharded_inference which IS bit-exact)."""
    from test_e2e import TINY_CODEC, TINY_S2A, TINY_T2S
    from edm_tts_tpu.models.codec import Codec
    from edm_tts_tpu.models.s2a import InjectionConformer
    from edm_tts_tpu.models.t2s import TextToSemantic
    from edm_tts_tpu.models.tokenizer.audio_tokenizer import AudioTokenizer
    from edm_tts_tpu.parallel.mesh import make_mesh

    rng = jax.random.PRNGKey(0)
    codec = Codec(TINY_CODEC)
    codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 640, 1)))
    s2a = InjectionConformer(TINY_S2A)
    s2a_params = jax.jit(
        lambda r: s2a.init(
            r, jnp.zeros((1, 4, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32),
            mask_rng=r, train=False,
        )
    )(rng)
    s2a_params = {
        "params": {**s2a_params["params"], "codec": codec_params["params"]}
    }
    t2s = TextToSemantic(TINY_T2S)
    t2s_params = jax.jit(
        lambda r: t2s.init(
            r, jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool),
            jnp.zeros((1, 16), bool), jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1, 4), bool), jnp.ones((1,)),
            mask_rng=r, train=False,
        )
    )(rng)

    def build(mesh):
        eng = TTSEngine.from_models(
            AudioTokenizer(codec, None), codec_params, None,
            s2a, s2a_params, t2s, t2s_params,
            pred_iters=2, s2a_steps=2, max_speech_len=16, text_bucket=8,
            length_bucket=8, batch_buckets=(4,), mesh=mesh,
        )
        k1, k2 = jax.random.split(rng)
        eng.register_speaker_codes(
            "p",
            jax.random.randint(k1, (1, 4, 10), 0, TINY_CODEC.codebook_size),
            jax.random.randint(k2, (1, 10), 0, TINY_S2A.num_semantic_tokens),
        )
        return eng

    texts = ["hello", "hey there", "third one"]
    gt = [8, 6, 12]
    w1 = build(None).synthesize(texts, "p", seed=5, gt_lengths=gt)
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    w4 = build(mesh).synthesize(texts, "p", seed=5, gt_lengths=gt)
    for a, b in zip(w1, w4):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    # buckets that don't divide the data axis are rejected at construction
    with pytest.raises(AssertionError):
        TTSEngine.from_models(
            AudioTokenizer(codec, None), codec_params, None,
            s2a, s2a_params, t2s, t2s_params,
            batch_buckets=(1, 2), mesh=mesh,
        )


@pytest.mark.slow
def test_engine_dp_mesh_quantized_matches_single_device():
    """Quantized serving composes with multi-chip DP serving: int8
    param leaves (kernel_q int8 + kernel_scale f32, models/quantize.py)
    replicate over the mesh like float leaves and the w8a8 engine on a
    (data=4) mesh produces the same audio as the single-device w8a8
    engine."""
    from test_e2e import TINY_CODEC, TINY_S2A, TINY_T2S
    from edm_tts_tpu.models.codec import Codec
    from edm_tts_tpu.models.quantize import quantize_s2a, quantize_t2s
    from edm_tts_tpu.models.s2a import InjectionConformer
    from edm_tts_tpu.models.t2s import TextToSemantic
    from edm_tts_tpu.models.tokenizer.audio_tokenizer import AudioTokenizer
    from edm_tts_tpu.parallel.mesh import make_mesh

    rng = jax.random.PRNGKey(0)
    codec = Codec(TINY_CODEC)
    codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 640, 1)))
    s2a = InjectionConformer(TINY_S2A)
    s2a_params = jax.jit(
        lambda r: s2a.init(
            r, jnp.zeros((1, 4, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32),
            mask_rng=r, train=False,
        )
    )(rng)
    s2a_params = {
        "params": {**s2a_params["params"], "codec": codec_params["params"]}
    }
    t2s = TextToSemantic(TINY_T2S)
    t2s_params = jax.jit(
        lambda r: t2s.init(
            r, jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool),
            jnp.zeros((1, 16), bool), jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1, 4), bool), jnp.ones((1,)),
            mask_rng=r, train=False,
        )
    )(rng)
    s2a_q, s2a_qparams = quantize_s2a(s2a, s2a_params, mode="w8a8")
    t2s_q, t2s_qparams = quantize_t2s(t2s, t2s_params, mode="w8a8")
    # the quantized tree really carries int8 leaves into the engine
    assert any(
        leaf.dtype == jnp.int8
        for leaf in jax.tree_util.tree_leaves(s2a_qparams)
    )

    def build(mesh):
        eng = TTSEngine.from_models(
            AudioTokenizer(codec, None), codec_params, None,
            s2a_q, s2a_qparams, t2s_q, t2s_qparams,
            pred_iters=2, s2a_steps=2, max_speech_len=16, text_bucket=8,
            length_bucket=8, batch_buckets=(4,), mesh=mesh,
        )
        k1, k2 = jax.random.split(rng)
        eng.register_speaker_codes(
            "p",
            jax.random.randint(k1, (1, 4, 10), 0, TINY_CODEC.codebook_size),
            jax.random.randint(k2, (1, 10), 0, TINY_S2A.num_semantic_tokens),
        )
        return eng

    texts = ["hello", "hey there"]
    gt = [8, 12]
    w1 = build(None).synthesize(texts, "p", seed=5, gt_lengths=gt)
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    w4 = build(mesh).synthesize(texts, "p", seed=5, gt_lengths=gt)
    for a, b in zip(w1, w4):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_engine_with_batcher_end_to_end(tiny_engine):
    b = DynamicBatcher(tiny_engine.synthesize, max_batch=4, max_wait_ms=100)
    futs = [
        b.submit(Request("hello", "alice", seed=1, gt_length=8)),
        b.submit(Request("hi you", "alice", seed=1, gt_length=12)),
    ]
    ws = [f.result(120) for f in futs]
    ds = tiny_engine.tokenizer.downsample_factor
    assert ws[0].shape == (8 * ds,) and ws[1].shape == (12 * ds,)
    assert all(np.isfinite(w).all() for w in ws)
    s = b.stats()
    b.close()
    assert s["requests"] == 2 and s["completed"] == 2 and s["failed"] == 0
    assert s["latency_s_mean"] > 0 and s["latency_s_max"] >= s["latency_s_mean"]
    assert s["mean_batch"] >= 1.0


@pytest.mark.slow
def test_http_server_end_to_end(tiny_engine):
    """Full transport stack: HTTP -> batcher -> engine -> WAV bytes, plus
    health/stats endpoints and error mapping."""
    import io
    import json
    import urllib.error
    import urllib.request

    from scipy.io import wavfile

    from edm_tts_tpu.serving import TTSServer

    srv = TTSServer(tiny_engine, max_batch=4, max_wait_ms=50).start()
    base = f"http://{srv.host}:{srv.port}"
    try:
        # health
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and "alice" in health["speakers"]

        # synthesize -> valid WAV of the requested length
        body = json.dumps(
            {"text": "hello", "speaker": "alice", "seed": 2, "gt_length": 8}
        ).encode()
        req = urllib.request.Request(
            f"{base}/synthesize", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            sr, pcm = wavfile.read(io.BytesIO(r.read()))
        assert sr == tiny_engine.sample_rate
        assert pcm.shape == (8 * tiny_engine.tokenizer.downsample_factor,)
        assert pcm.dtype == np.int16

        # unknown speaker -> 400
        bad = urllib.request.Request(
            f"{base}/synthesize",
            data=json.dumps({"text": "x", "speaker": "nope"}).encode(),
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400

        # register a speaker over HTTP, then use it
        import base64

        pcm_f32 = (np.random.default_rng(1).standard_normal(3200) * 0.1
                   ).astype("<f4")
        reg = urllib.request.Request(
            f"{base}/speakers",
            data=json.dumps({
                "name": "bob",
                "pcm_b64": base64.b64encode(pcm_f32.tobytes()).decode(),
                "sample_rate": tiny_engine.sample_rate,
            }).encode(),
        )
        with urllib.request.urlopen(reg, timeout=120) as r:
            assert json.loads(r.read())["ok"]
        body2 = json.dumps(
            {"text": "hey", "speaker": "bob", "gt_length": 6}
        ).encode()
        with urllib.request.urlopen(
            urllib.request.Request(f"{base}/synthesize", data=body2),
            timeout=120,
        ) as r:
            sr2, pcm2 = wavfile.read(io.BytesIO(r.read()))
        assert pcm2.shape == (6 * tiny_engine.tokenizer.downsample_factor,)

        # long-form: one request, chunked server-side through the batcher
        from edm_tts_tpu.serving.chunking import split_text

        long_text = "hello there friend. how are you."
        n_chunks = len(split_text(long_text, 12))
        assert n_chunks == 3
        body3 = json.dumps({
            "text": long_text, "speaker": "alice", "seed": 4,
            "long": True, "max_chunk_chars": 12, "crossfade_ms": 5.0,
        }).encode()
        with urllib.request.urlopen(
            urllib.request.Request(f"{base}/synthesize", data=body3),
            timeout=300,
        ) as r:
            sr3, pcm3 = wavfile.read(io.BytesIO(r.read()))
        assert sr3 == tiny_engine.sample_rate and pcm3.size > 0

        # long + gt_length is ambiguous -> 400
        bad_long = urllib.request.Request(
            f"{base}/synthesize",
            data=json.dumps({
                "text": "x y. z w.", "speaker": "alice",
                "long": True, "gt_length": 8,
            }).encode(),
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad_long, timeout=30)
        assert ei.value.code == 400

        # stats reflect the two short synthesizes + the long one's chunks
        with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["completed"] == 2 + n_chunks and stats["failed"] == 0
    finally:
        srv.shutdown()


# ---------------------------------------------------------------- chunking
def test_split_text_prefers_sentence_boundaries():
    from edm_tts_tpu.serving.chunking import split_text

    # two sentences that cannot share a 7-char chunk split at the boundary
    assert split_text("ab cd. ef gh.", 7) == ["ab cd.", "ef gh."]
    # sentences pack greedily when they fit together
    assert split_text("ab. cd. ef.", 7) == ["ab. cd.", "ef."]
    # whitespace runs collapse, content is otherwise preserved
    for text in (
        "Hello there, friend.  How are\nyou today? Fine; thanks!",
        "one two three four five six seven eight nine ten",
        "x" * 95 + ". " + "y" * 40,
    ):
        for n in (8, 17, 64):
            chunks = split_text(text, n)
            assert all(len(c) <= n for c in chunks)
            # non-space content always survives, in order (mid-word hard
            # splits turn into chunk boundaries, i.e. extra spaces)
            assert "".join(chunks).replace(" ", "") == "".join(text.split())
            if max(len(w) for w in text.split()) <= n:
                # no word exceeded the budget -> rejoining is exact
                assert " ".join(chunks) == " ".join(text.split())


def test_split_text_hard_splits_oversized_sentences():
    from edm_tts_tpu.serving.chunking import split_text

    # a long sentence splits at interior spaces, never exceeding the budget
    chunks = split_text("alpha beta gamma delta epsilon", 11)
    assert chunks == ["alpha beta", "gamma delta", "epsilon"]
    # a single word longer than the budget splits mid-word (last resort)
    assert split_text("abcdefghij", 4) == ["abcd", "efgh", "ij"]
    with pytest.raises(ValueError):
        split_text("   ", 16)
    with pytest.raises(ValueError):
        split_text("hi", 0)


def test_join_waveforms_crossfade_and_gap():
    from edm_tts_tpu.serving.chunking import join_waveforms

    a, b = np.ones(100, np.float32), np.ones(100, np.float32)
    # equal-power (sin/cos) crossfade: cos^2 + sin^2 gains sum to 1, so the
    # POWER through the joint of uncorrelated unit-power chunks stays flat
    # (a linear equal-gain ramp would dip -3 dB at the midpoint)
    out = join_waveforms([a, b], 1000, crossfade_ms=20.0)
    assert out.shape == (180,)
    theta = np.linspace(0.0, np.pi / 2, 20, dtype=np.float32)
    np.testing.assert_allclose(
        out[80:100] ** 2,
        np.cos(theta) ** 2 + np.sin(theta) ** 2 + 2 * np.cos(theta) * np.sin(theta),
        atol=1e-5,
    )
    np.testing.assert_allclose(out[:80], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[100:], 1.0, atol=1e-6)
    rng = np.random.default_rng(0)
    u = rng.standard_normal(4000).astype(np.float32)
    v = rng.standard_normal(4000).astype(np.float32)
    out = join_waveforms([u, v], 1000, crossfade_ms=2000.0)
    # expected power of the mix of independent unit-variance noise is
    # cos^2 + sin^2 = 1 everywhere; check the joint region's mean power
    mid = out[out.shape[0] // 2 - 500 : out.shape[0] // 2 + 500]
    assert abs(float(np.mean(mid**2)) - 1.0) < 0.15
    # zero crossfade -> plain concat
    assert join_waveforms([a, b], 1000, crossfade_ms=0.0).shape == (200,)
    # a gap inserts silence and disables the crossfade
    out = join_waveforms([a, b], 1000, crossfade_ms=20.0, gap_ms=10.0)
    assert out.shape == (210,)
    np.testing.assert_allclose(out[100:110], 0.0)
    # crossfade clamps to the shorter waveform
    out = join_waveforms(
        [np.ones(5, np.float32), np.ones(50, np.float32)], 1000,
        crossfade_ms=20.0,
    )
    assert out.shape == (50,)
    with pytest.raises(ValueError):
        join_waveforms([], 1000)


@pytest.mark.slow
def test_engine_synthesize_long_matches_manual_chunks(tiny_engine):
    """synthesize_long == split_text -> batched synthesize -> join, and the
    chunk batching slices at the engine's largest batch bucket (chunks of
    one document ride the batch dimension)."""
    from edm_tts_tpu.serving.chunking import join_waveforms, split_text

    text = "hello there friend. how are you today? fine thanks, and you."
    long_wav = tiny_engine.synthesize_long(
        text, "alice", seed=7, max_chunk_chars=12, crossfade_ms=5.0
    )
    chunks = split_text(text, 12)
    assert len(chunks) > 4  # exceeds the largest batch bucket (4)
    cap = max(tiny_engine.batch_buckets)
    wavs = []
    for i in range(0, len(chunks), cap):
        wavs += tiny_engine.synthesize(chunks[i : i + cap], "alice", seed=7)
    manual = join_waveforms(
        wavs, tiny_engine.sample_rate, crossfade_ms=5.0
    )
    np.testing.assert_array_equal(long_wav, manual)
    assert np.isfinite(long_wav).all()
    # crossfade shortens vs plain concatenation by (n_chunks-1) overlaps
    assert long_wav.shape[0] < sum(w.shape[0] for w in wavs)
