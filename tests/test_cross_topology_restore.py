"""Cross-topology checkpoint restore: save under one mesh, resume under
another, and training continues identically.

The reference's ZeRO-2 resume story (configs/ds_config.json:5-13) done right
for pods: a preempted (data=4, fsdp=2) job must be resumable on (8,1) or a
single chip. Orbax restores into the template's shardings, so the restored
params AND optimizer state land resharded; these tests prove the continued
training trajectory is identical (further AdamW steps would diverge quickly
if any optimizer-state leaf were wrong) for both the generic Trainer and the
GANTrainer.
"""

import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.codec.discriminator import Discriminator, DiscriminatorConfig
from edm_tts_tpu.models.codec.losses import ReconstructionLoss
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig
from edm_tts_tpu.parallel.mesh import make_mesh
from edm_tts_tpu.train.gan_trainer import GANTrainer, GANTrainingArguments
from edm_tts_tpu.train.optim import freeze_subtree_mask
from edm_tts_tpu.train.trainer import Trainer, TrainingArguments

TINY_CODEC = CodecConfig(
    encoder_dim=4, decoder_dim=32, n_codebooks=4, codebook_size=16,
    codebook_dim=4, quantizer_dropout=0.0,
)
TINY = S2AConfig(
    hidden_size=32, num_semantic_tokens=16, encoder_num_heads=4,
    encoder_num_layers=2, injection_layers=(1,),
    encoder_attn_dropout=0.0, encoder_ff_dropout=0.0, encoder_conv_dropout=0.0,
    codec=TINY_CODEC,
)


def _batches(n, b=8, t=16):
    rng = np.random.default_rng(0)
    return [
        {
            "acoustic_tokens": rng.integers(0, 16, (b, 4, t)),
            "semantic_tokens": rng.integers(0, 16, (b, t)),
        }
        for _ in range(n)
    ]


def _trainer(out_dir, max_steps, n_data, n_fsdp, resume):
    model = InjectionConformer(TINY)
    params = jax.jit(
        lambda r: model.init(
            r, jnp.zeros((1, 4, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32),
            mask_rng=r, train=False,
        )
    )(jax.random.PRNGKey(0))

    def loss_fn(p, batch, rng):
        out = model.apply(
            p, batch["acoustic_tokens"], batch["semantic_tokens"],
            mask_rng=rng, train=False,
        )
        return out["loss"], {}

    args = TrainingArguments(
        output_dir=str(out_dir), max_steps=max_steps, logging_steps=1000,
        save_steps=2, eval_steps=1000, warmup_steps=1,
        overwrite_output_dir=not resume,
    )
    mesh = make_mesh(n_data, n_fsdp,
                     devices=jax.devices()[: n_data * n_fsdp])
    return Trainer(args, loss_fn, params,
                   frozen_mask=freeze_subtree_mask(params, "codec"), mesh=mesh)


def _flat_params(state):
    return {
        jax.tree_util.keystr(k): np.asarray(v)
        for k, v in jax.tree_util.tree_leaves_with_path(state.params)
    }


def _flat_state(state):
    """Every leaf: params AND optimizer state AND step."""
    return {
        jax.tree_util.keystr(k): np.asarray(v)
        for k, v in jax.tree_util.tree_leaves_with_path(state)
    }


def _assert_states_equal(a, b, atol=0.0, rtol=0.0):
    fa, fb = _flat_state(a), _flat_state(b)
    assert fa.keys() == fb.keys()
    for k in fa:
        if atol == 0.0 and rtol == 0.0:
            np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)
        else:
            np.testing.assert_allclose(fa[k], fb[k], atol=atol, rtol=rtol,
                                       err_msg=k)


@pytest.mark.slow
@pytest.mark.parametrize("target", [(8, 1), (1, 1)])
def test_trainer_restore_across_topologies(tmp_path, target):
    batches = _batches(4)

    src = tmp_path / "src"
    trainer = _trainer(src, 2, 4, 2, resume=False)
    trainer.train(iter(batches))  # checkpoints at step 2

    # control: continue on the ORIGINAL (4,2) mesh
    ctrl_dir = tmp_path / "ctrl"
    shutil.copytree(src, ctrl_dir)
    ctrl = _trainer(ctrl_dir, 4, 4, 2, resume=True)

    # resume on the target mesh from a copy of the same checkpoint
    tgt_dir = tmp_path / f"tgt{target[0]}x{target[1]}"
    shutil.copytree(src, tgt_dir)
    resumed = _trainer(tgt_dir, 4, *target, resume=True)

    # (1) restore itself is EXACT across topologies: params, full optimizer
    # state and step all restore bit-identically onto the new mesh
    assert ctrl.maybe_resume() == resumed.maybe_resume() == 2
    _assert_states_equal(ctrl.state, resumed.state)

    # (2) continued training stays on the same trajectory (tolerance covers
    # cross-mesh reduction-order float noise amplified by 2 AdamW steps)
    ctrl_state = ctrl.train(iter(batches))
    resumed_state = resumed.train(iter(batches))
    assert int(resumed_state.step) == 4
    a, b = _flat_params(ctrl_state), _flat_params(resumed_state)
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=5e-4, rtol=1e-2, err_msg=k)


@pytest.mark.slow
def test_gan_trainer_restore_across_topologies(tmp_path):
    def _gan(out_dir, max_steps, n_data, n_fsdp):
        codec = Codec(TINY_CODEC)
        disc = Discriminator(DiscriminatorConfig(periods=(2,), fft_sizes=(128,)))
        x = jnp.zeros((1, 640, 1))
        g = jax.jit(codec.init)(jax.random.PRNGKey(0), x)
        d = jax.jit(disc.init)(jax.random.PRNGKey(1), x)
        recon = ReconstructionLoss(
            16000,
            mel_spectrogram_args={"n_mels": (5,), "window_lengths": (64,),
                                  "mel_fmin": (0.0,), "mel_fmax": (None,)},
        )
        args = GANTrainingArguments(
            output_dir=str(out_dir), max_steps=max_steps, logging_steps=1000,
            save_steps=2, eval_steps=1000,
        )
        mesh = make_mesh(n_data, n_fsdp,
                         devices=jax.devices()[: n_data * n_fsdp])
        return GANTrainer(args, codec, disc, g, d, recon, mesh=mesh)

    rng = np.random.default_rng(1)
    audio = [0.1 * rng.standard_normal((8, 640, 1)).astype(np.float32)
             for _ in range(4)]

    src = tmp_path / "src"
    _gan(src, 2, 4, 2).train(iter(audio))

    ctrl_dir = tmp_path / "ctrl"
    shutil.copytree(src, ctrl_dir)
    ctrl = _gan(ctrl_dir, 4, 4, 2)

    tgt_dir = tmp_path / "tgt"
    shutil.copytree(src, tgt_dir)
    resumed = _gan(tgt_dir, 4, 8, 1)

    # exact G+D state (params + both optimizers) restore across topologies
    assert ctrl._restore() == resumed._restore() == 2
    _assert_states_equal(ctrl.g_state, resumed.g_state)
    _assert_states_equal(ctrl.d_state, resumed.d_state)

    g_ctrl, d_ctrl = ctrl.train(iter(audio))
    g_new, d_new = resumed.train(iter(audio))
    for ctrl_state, new_state in [(g_ctrl, g_new), (d_ctrl, d_new)]:
        a, b = _flat_params(ctrl_state), _flat_params(new_state)
        for k in a:
            np.testing.assert_allclose(
                a[k], b[k], atol=5e-4, rtol=1e-2, err_msg=k
            )
