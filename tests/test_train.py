"""Training substrate tests: GAN step, trainer loop + checkpoint resume,
fsdp sharding rules on the 8-device CPU mesh, optimizer masking."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax.training import train_state

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.codec.discriminator import Discriminator, DiscriminatorConfig
from edm_tts_tpu.models.codec.losses import ReconstructionLoss
from edm_tts_tpu.parallel.mesh import (
    FSDP_AXIS,
    batch_sharding,
    fsdp_sharding_for,
    make_mesh,
    param_shardings,
)
from edm_tts_tpu.train.gan import TrainState, gan_train_step
from edm_tts_tpu.train.optim import adamw, freeze_subtree_mask, exponential_schedule

TINY_CODEC = CodecConfig(
    encoder_dim=4, decoder_dim=32, n_codebooks=2, codebook_size=16,
    codebook_dim=4, quantizer_dropout=0.5,
)
TINY_DISC = DiscriminatorConfig(periods=(2, 3), fft_sizes=(128,))


def test_gan_train_step_updates_both():
    codec = Codec(TINY_CODEC)
    disc = Discriminator(TINY_DISC)
    audio = jax.random.normal(jax.random.PRNGKey(0), (2, 640, 1)) * 0.1
    g_params = jax.jit(codec.init)(jax.random.PRNGKey(1), audio)
    d_params = jax.jit(disc.init)(jax.random.PRNGKey(2), audio)
    recon = ReconstructionLoss(
        16000,
        mel_spectrogram_args={
            "n_mels": (5, 10),
            "window_lengths": (32, 64),
            "mel_fmin": (0.0, 0.0),
            "mel_fmax": (None, None),
        },
    )
    tx = adamw(exponential_schedule(1e-4, 0.999996), b1=0.8, b2=0.99)
    g_state = TrainState.create(apply_fn=None, params=g_params, tx=tx)
    d_state = TrainState.create(apply_fn=None, params=d_params, tx=tx)

    # the step donates the states; snapshot params host-side first
    g_before = jax.tree_util.tree_map(np.asarray, g_state.params)
    g2, d2, metrics = gan_train_step(
        codec, disc, recon, g_state, d_state, audio, jax.random.PRNGKey(3)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["adv/disc_loss"]))
    assert np.isfinite(float(metrics["mel/loss"]))
    # both models actually moved
    g_diff = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - np.asarray(b)).max()), g_before, g2.params
    )
    assert max(jax.tree_util.tree_leaves(g_diff)) > 0
    assert g2.step == 1 and d2.step == 1


def test_freeze_subtree_mask_blocks_updates():
    params = {"params": {"codec": {"w": jnp.ones(4)}, "head": {"w": jnp.ones(4)}}}
    mask = freeze_subtree_mask(params, "codec")
    tx = adamw(1e-2, frozen_mask=mask)
    state = train_state.TrainState.create(apply_fn=None, params=params, tx=tx)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    new = state.apply_gradients(grads=grads)
    np.testing.assert_array_equal(
        np.asarray(new.params["params"]["codec"]["w"]), np.ones(4)
    )
    assert float(jnp.abs(new.params["params"]["head"]["w"] - 1.0).max()) > 0


def test_fsdp_sharding_rule():
    mesh = make_mesh(n_fsdp=2)
    assert mesh.shape == {"data": 4, "fsdp": 2, "model": 1}
    big = jnp.zeros((512, 512))
    s = fsdp_sharding_for(mesh, big, min_size=16)
    assert FSDP_AXIS in jax.tree_util.tree_leaves(s.spec) or s.spec != ()
    small = jnp.zeros((3,))
    s_small = fsdp_sharding_for(mesh, small, min_size=16)
    assert s_small.spec == ()
    odd = jnp.zeros((7, 9))  # nothing divisible by 2
    assert fsdp_sharding_for(mesh, odd, min_size=1).spec == ()


def test_sharded_train_step_on_mesh():
    """End-to-end sharded step: batch over data axis, params over fsdp."""
    mesh = make_mesh(n_fsdp=2)

    import flax.linen as nn

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(64)(x)
            x = jax.nn.relu(x)
            return nn.Dense(8)(x)

    model = MLP()
    x = jnp.ones((8, 16))
    params = model.init(jax.random.PRNGKey(0), x)
    tx = optax.adam(1e-3)
    state = train_state.TrainState.create(apply_fn=None, params=params, tx=tx)
    state = jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, s), state,
        param_shardings(mesh, state, min_size=16),
    )
    xb = jax.device_put(x, batch_sharding(mesh))

    @jax.jit
    def step(state, x):
        def loss(p):
            return jnp.mean(jnp.square(model.apply(p, x)))

        l, g = jax.value_and_grad(loss)(state.params)
        return state.apply_gradients(grads=g), l

    with mesh:
        state, loss = step(state, xb)
    assert np.isfinite(float(loss))
    # params stayed sharded over fsdp
    kernel = state.params["params"]["Dense_0"]["kernel"]
    assert len(kernel.sharding.device_set) >= 2


def test_checkpoint_roundtrip(tmp_path):
    from edm_tts_tpu.parallel.checkpoint import CheckpointManager

    state = {"w": jnp.arange(8.0), "step": jnp.asarray(3)}
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_total_limit=2)
    mgr.save(10, state, {"step": 10, "best_val_loss": 1.5})
    mgr.save(20, state, {"step": 20, "best_val_loss": 1.2})
    assert mgr.latest_step() == 20
    restored, meta = mgr.restore(template=state)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(8.0))
    assert meta["step"] == 20 and meta["best_val_loss"] == 1.2
    mgr.close()


def test_export_import_model(tmp_path):
    from edm_tts_tpu.parallel.checkpoint import export_model, load_model_params

    params = {"params": {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}}
    export_model(str(tmp_path / "best"), params, '{"model_type": "test"}')
    loaded = load_model_params(str(tmp_path / "best"), params)
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["w"]), np.ones((4, 4))
    )
