"""Sequence parallelism on the flagship models: the s2a injection conformer
and the t2s masked-LM run their full training forwards with
``attn_implementation="ring"`` over a (data, fsdp, model, sequence) mesh
(parallel/mesh.py::make_mesh(n_seq>1)) and produce exactly the single-device
losses. Ring attention reshards T over the ``sequence`` ring inside the
model; GSPMD propagates the rest (embeddings, convs via halo exchange,
masked CE). The reference computes attention on one GPU only.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from edm_tts_tpu.models.codec import CodecConfig
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig
from edm_tts_tpu.models.t2s import T2SConfig
from edm_tts_tpu.models.t2s.model import TextToSemantic
from edm_tts_tpu.parallel.mesh import make_mesh

S2A_TINY = dict(
    hidden_size=64,
    num_semantic_tokens=32,
    encoder_num_heads=2,
    encoder_num_layers=2,
    injection_layers=(1,),
    encoder_attn_dropout=0.0,
    encoder_ff_dropout=0.0,
    encoder_conv_dropout=0.0,
    codec=CodecConfig(
        encoder_dim=8,
        decoder_dim=32,
        n_codebooks=4,
        codebook_size=32,
        codebook_dim=4,
        quantizer_dropout=0.0,
    ),
)

T2S_TINY = dict(
    hidden_size=32,
    main_encoder_num_heads=4,
    main_encoder_num_layers=2,
    length_predictor_num_heads=4,
    length_predictor_num_layers=1,
)


def test_s2a_training_forward_ring_matches_single_device():
    b, t = 2, 32
    cfg = S2AConfig(**S2A_TINY)
    model = InjectionConformer(cfg)
    rng = jax.random.PRNGKey(0)
    ac = jax.random.randint(
        jax.random.PRNGKey(1), (b, cfg.num_quantizers, t), 0, cfg.codec.codebook_size
    )
    sem = jax.random.randint(
        jax.random.PRNGKey(2), (b, t), 0, cfg.num_semantic_tokens
    )
    params = jax.jit(
        lambda r: model.init(r, ac[:1, :, :8], sem[:1, :8], mask_rng=r, train=False)
    )(rng)
    ref = model.apply(params, ac, sem, mask_rng=rng, train=False)["loss"]

    ring_model = InjectionConformer(
        dataclasses.replace(cfg, attn_implementation="ring")
    )
    mesh = make_mesh(2, 1, 1, n_seq=4)
    assert mesh.shape == {"data": 2, "fsdp": 1, "model": 1, "sequence": 4}
    acs = jax.device_put(ac, NamedSharding(mesh, P("data", None, "sequence")))
    sems = jax.device_put(sem, NamedSharding(mesh, P("data", "sequence")))
    with mesh:
        loss = jax.jit(
            lambda p, a, s: ring_model.apply(
                p, a, s, mask_rng=rng, train=False
            )["loss"]
        )(params, acs, sems)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)


def test_t2s_training_forward_ring_matches_single_device():
    b, l, lt = 2, 24, 7  # lenpred runs at lt+1=8: both divisible by n_seq=4
    cfg = T2SConfig(**T2S_TINY)
    model = TextToSemantic(cfg)
    rng = jax.random.PRNGKey(0)
    args = (
        jax.random.randint(jax.random.PRNGKey(1), (b, l), 0, cfg.total_num_tokens),
        jnp.ones((b, l), bool),
        jnp.zeros((b, l), bool).at[:, 8:20].set(True),
        jax.random.randint(jax.random.PRNGKey(2), (b, lt), 0, cfg.text_vocab_size),
        jnp.ones((b, lt), bool),
        jnp.full((b,), 12.0),
    )
    params = jax.jit(model.init, static_argnames=("train",))(
        rng, *args, mask_rng=jax.random.PRNGKey(3), train=False
    )
    ref = model.apply(params, *args, mask_rng=rng, train=False)["loss"]

    ring_model = TextToSemantic(
        dataclasses.replace(cfg, attn_implementation="ring")
    )
    mesh = make_mesh(1, 1, 1, devices=jax.devices()[:4], n_seq=4)
    with mesh:
        loss = jax.jit(
            lambda p, *a: ring_model.apply(p, *a, mask_rng=rng, train=False)[
                "loss"
            ]
        )(params, *args)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)
