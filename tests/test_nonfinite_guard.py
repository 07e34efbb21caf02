"""Non-finite update guard (beyond-reference training hardening): with
``skip_nonfinite_updates`` a NaN/inf gradient skips the optimizer update —
params and opt-state survive, the step counter advances (LR schedules stay
on time), and the skip surfaces as metrics["skipped_nonfinite"]. Default
OFF for recipe parity (the reference HF/DeepSpeed bf16 setup has no guard).
"""

import jax
import jax.numpy as jnp
import numpy as np

from edm_tts_tpu.parallel.mesh import make_mesh
from edm_tts_tpu.train.trainer import Trainer, TrainingArguments


def _trainer(tmp_path, **kw):
    params = {"w": jnp.ones((4,), jnp.float32)}

    def loss_fn(p, batch, rng):
        return (p["w"] * batch["x"]).sum(), {"loss_weight": batch["x"].shape[0]}

    args = TrainingArguments(
        output_dir=str(tmp_path / "out"), max_steps=10, warmup_steps=1,
        overwrite_output_dir=True, **kw,
    )
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    return Trainer(args, loss_fn, params, mesh=mesh)


def _leaf(tree, *path):
    for p in path:
        tree = tree[p]
    return np.asarray(tree)


def test_guard_skips_nonfinite_and_applies_finite(tmp_path):
    tr = _trainer(tmp_path, skip_nonfinite_updates=True)
    rng = jax.random.PRNGKey(0)
    w0 = _leaf(tr.state.params, "w").copy()

    bad = {"x": jnp.full((2, 4), jnp.nan)}
    tr.state, m = tr._train_step(tr.state, bad, rng)
    assert float(m["skipped_nonfinite"]) == 1.0
    np.testing.assert_array_equal(_leaf(tr.state.params, "w"), w0)
    assert int(tr.state.step) == 1  # step advances on skip (LR stays on time)
    # opt-state untouched by the skipped step
    mu = jax.tree_util.tree_leaves(tr.state.opt_state)
    assert all(np.isfinite(np.asarray(x)).all() for x in mu)

    good = {"x": jnp.ones((2, 4))}
    tr.state, m = tr._train_step(tr.state, good, rng)
    assert float(m["skipped_nonfinite"]) == 0.0
    assert not np.array_equal(_leaf(tr.state.params, "w"), w0)
    assert np.isfinite(_leaf(tr.state.params, "w")).all()
    assert int(tr.state.step) == 2


def test_guard_microbatch_path(tmp_path):
    tr = _trainer(tmp_path, skip_nonfinite_updates=True, micro_batches=2)
    rng = jax.random.PRNGKey(0)
    w0 = _leaf(tr.state.params, "w").copy()
    # ONE poisoned microbatch poisons the accumulated grad -> whole step skips
    x = jnp.ones((2, 4)).at[1].set(jnp.nan)
    tr.state, m = tr._train_step(tr.state, {"x": x}, rng)
    assert float(m["skipped_nonfinite"]) == 1.0
    np.testing.assert_array_equal(_leaf(tr.state.params, "w"), w0)


def test_default_off_poisons_params(tmp_path):
    """Recipe-parity default: no guard, NaN flows into params (documented)."""
    tr = _trainer(tmp_path)
    tr.state, m = tr._train_step(
        tr.state, {"x": jnp.full((2, 4), jnp.nan)}, jax.random.PRNGKey(0)
    )
    assert "skipped_nonfinite" not in m
    assert not np.isfinite(_leaf(tr.state.params, "w")).all()


def test_gan_guard_skips_both_states():
    from test_gan_trainer_loop import TINY_CODEC, TINY_DISC
    from edm_tts_tpu.models.codec import Codec
    from edm_tts_tpu.models.codec.discriminator import Discriminator
    from edm_tts_tpu.models.codec.losses import ReconstructionLoss
    from edm_tts_tpu.train.gan import TrainState, gan_train_step
    import optax

    codec = Codec(TINY_CODEC)
    disc = Discriminator(TINY_DISC)
    x = jnp.zeros((1, 640, 1))
    g_params = jax.jit(codec.init)(jax.random.PRNGKey(0), x)
    d_params = jax.jit(disc.init)(jax.random.PRNGKey(1), x)
    recon = ReconstructionLoss(
        16000,
        mel_spectrogram_args={
            "n_mels": (5,), "window_lengths": (64,),
            "mel_fmin": (0.0,), "mel_fmax": (None,),
        },
    )
    tx = optax.adam(1e-4)
    g_state = TrainState.create(apply_fn=None, params=g_params, tx=tx)
    d_state = TrainState.create(apply_fn=None, params=d_params, tx=tx)
    g0 = np.asarray(jax.tree_util.tree_leaves(g_params)[0]).copy()

    bad = jnp.full((2, 640, 1), jnp.nan)
    g_state, d_state, m = gan_train_step(
        codec, disc, recon, g_state, d_state, bad, jax.random.PRNGKey(2),
        None, True,
    )
    assert float(m["skipped_nonfinite"]) == 1.0
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(g_state.params)[0]), g0
    )
    assert int(g_state.step) == 1 and int(d_state.step) == 1

    t = jnp.arange(640) / 16000.0
    good = jnp.broadcast_to(
        0.3 * jnp.sin(2 * jnp.pi * 300 * t)[None, :, None], (2, 640, 1)
    )
    g_state, d_state, m = gan_train_step(
        codec, disc, recon, g_state, d_state, good, jax.random.PRNGKey(3),
        None, True,
    )
    assert float(m["skipped_nonfinite"]) == 0.0
    assert not np.array_equal(
        np.asarray(jax.tree_util.tree_leaves(g_state.params)[0]), g0
    )
