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


def test_trainer_n_seq_matches_default_mesh(tmp_path):
    """Full Trainer runs (loss -> grads -> AdamW, 3 steps) on a
    (data=4, sequence=2) mesh with the ring-attention s2a model end in
    exactly the same parameters as the default data-parallel mesh with
    auto attention — SP is usable straight from TrainingArguments.n_seq
    (and the run_*.py YAML key)."""
    from edm_tts_tpu.train.trainer import Trainer, TrainingArguments

    b, t = 8, 16
    cfg = S2AConfig(**S2A_TINY)
    rng = jax.random.PRNGKey(0)

    def batches():
        k = jax.random.PRNGKey(7)
        while True:
            k, k1, k2 = jax.random.split(k, 3)
            yield {
                "ac": jax.random.randint(
                    k1, (b, cfg.num_quantizers, t), 0, cfg.codec.codebook_size
                ),
                "sem": jax.random.randint(k2, (b, t), 0, cfg.num_semantic_tokens),
            }

    # params are implementation-independent: init once (auto) and share
    init_model = InjectionConformer(cfg)
    init_params = jax.jit(
        lambda r: init_model.init(
            r,
            jnp.zeros((1, cfg.num_quantizers, 8), jnp.int32),
            jnp.zeros((1, 8), jnp.int32),
            mask_rng=r,
            train=False,
        )
    )(rng)

    def run(attn_impl, n_seq, out):
        model = InjectionConformer(
            dataclasses.replace(cfg, attn_implementation=attn_impl)
        )
        # fresh buffers: the jitted step donates the state, and device_put
        # onto a matching sharding aliases rather than copies
        params = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), init_params
        )

        def loss_fn(p, batch, step_rng):
            o = model.apply(
                p, batch["ac"], batch["sem"], mask_rng=step_rng, train=False
            )
            return o["loss"], {}

        args = TrainingArguments(
            output_dir=str(tmp_path / out),
            max_steps=3,
            warmup_steps=1,
            logging_steps=1000,
            save_steps=10_000,
            overwrite_output_dir=True,
            n_seq=n_seq,
        )
        trainer = Trainer(args, loss_fn, params)
        return trainer.train(batches())

    s_ref = run("auto", 1, "ref")
    s_ring = run("ring", 2, "ring")
    flat_ref, _ = jax.tree_util.tree_flatten(s_ref.params)
    flat, _ = jax.tree_util.tree_flatten(s_ring.params)
    for a, b_ in zip(flat, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-5
        )


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
