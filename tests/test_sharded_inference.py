"""Device-level data-parallel inference sharding of the fused E2E pipeline.

The reference's inference-scale story is per-process dataset sharding
(dump_tokens.py:152-179, covered by test_utilities/test_dump_tokens_cli);
this test adds the device-level analog: the ONE-dispatch e2e_synthesize
program pjit-sharded over a `data` mesh axis must produce bit-identical
audio to the single-device run (XLA inserts the collectives; none are
actually needed for pure DP inference, so parity must be exact).
Runs on the 8-virtual-device CPU mesh (tests/conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tts_tpu.models.s2a import InjectionConformer
from edm_tts_tpu.models.t2s import TextToSemantic
from edm_tts_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from edm_tts_tpu.pipeline import e2e_synthesize
from tests.test_e2e import TINY_CODEC, TINY_S2A, TINY_T2S


@pytest.mark.slow
def test_e2e_pipeline_dp_sharded_matches_single_device():
    rng = jax.random.PRNGKey(0)
    s2a = InjectionConformer(TINY_S2A, dtype=jnp.float32)
    t2s = TextToSemantic(TINY_T2S, dtype=jnp.float32)
    s2a_params = jax.jit(
        lambda r: s2a.init(r, jnp.zeros((1, 4, 8), jnp.int32),
                           jnp.zeros((1, 8), jnp.int32), mask_rng=r,
                           train=False)
    )(rng)
    # graft full codec params (decoder included): the s2a training init only
    # traces the quantizer (same pattern as bench.py)
    from edm_tts_tpu.models.codec import Codec

    codec = Codec(TINY_CODEC, dtype=jnp.float32)
    codec_params = jax.jit(codec.init)(
        rng, jnp.zeros((1, TINY_CODEC.hop_length, 1))
    )
    s2a_params = {
        "params": {**s2a_params["params"], "codec": codec_params["params"]}
    }
    t2s_params = jax.jit(
        lambda r: t2s.init(
            r, jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool),
            jnp.zeros((1, 16), bool), jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1, 4), bool), jnp.ones((1,)), mask_rng=r, train=False,
        )
    )(rng)

    batch = 8
    text = jax.random.randint(rng, (batch, 12), 5, 13)  # tiny joint vocab
    text_lengths = jnp.full((batch,), 12, jnp.int32)
    prompt_ac = jax.random.randint(rng, (batch, 4, 6), 0, 16)
    prompt_sem = jax.random.randint(rng, (batch, 6), 0, 8)
    gt_length = jnp.full((batch,), 20, jnp.int32)

    def run(mesh):
        data_in = (text, text_lengths, prompt_ac, prompt_sem, gt_length)
        if mesh is not None:
            bs, rep = batch_sharding(mesh), replicated(mesh)
            data_in = tuple(jax.device_put(x, bs) for x in data_in)
            tp = jax.device_put(t2s_params, rep)
            sp = jax.device_put(s2a_params, rep)
        else:
            tp, sp = t2s_params, s2a_params
        tt, tl, pa, ps, gl = data_in
        out = jax.jit(
            lambda tp, sp, tt, tl, pa, ps: e2e_synthesize(
                t2s, s2a, tp, sp, tt, tl, pa, ps, jax.random.PRNGKey(7),
                pred_iters=2, steps=2, max_speech_len=20, gt_length=gl,
                assume_full_canvas=True,
            )
        )(tp, sp, tt, tl, pa, ps)
        return np.asarray(out["audio"]), np.asarray(out["lengths"])

    audio_1, len_1 = run(None)
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    audio_dp, len_dp = run(mesh)

    np.testing.assert_array_equal(len_1, len_dp)
    np.testing.assert_array_equal(audio_1, audio_dp)
