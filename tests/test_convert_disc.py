"""Differential parity: flax Discriminator ensemble vs the reference torch
DACDiscriminator (MPD + MRD, the default GAN recipe; MSD is disabled by the
reference config).

The torchaudio.transforms.Spectrogram the reference MRD needs is provided by
a faithful torch.stft wrapper (reference_torch.py) — torchaudio itself is a
thin wrapper over torch.stft, so the numerical oracle is unchanged. Every
feature map (including the logits map the LSGAN/feature-matching losses
consume, dac_loss.py:358-384) must match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from edm_tts_tpu.models.codec.convert import discriminator_from_torch_state_dict
from edm_tts_tpu.models.codec.discriminator import Discriminator, DiscriminatorConfig
from reference_torch import install_reference_path

install_reference_path()

from edm_tts.models.dac.discriminators import (  # noqa: E402
    DACDiscriminator,
    DACDiscriminatorConfig,
)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    ref = DACDiscriminator(
        DACDiscriminatorConfig(
            periods=[2, 3], rates=[], fft_sizes=[512], sample_rate=16000
        )
    ).eval()
    cfg = DiscriminatorConfig(
        sample_rate=16000, periods=(2, 3), rates=(), fft_sizes=(512,)
    )
    model = Discriminator(cfg)
    variables = jax.tree.map(
        jnp.asarray, discriminator_from_torch_state_dict(cfg, ref.state_dict())
    )
    return ref, model, variables


def test_fmaps_match(pair):
    ref, model, variables = pair
    rng = np.random.default_rng(0)
    audio = (0.5 * rng.standard_normal((2, 4000))).astype(np.float32)
    with torch.no_grad():
        ref_fmaps = ref(torch.from_numpy(audio)[:, None, :])
    fmaps = jax.jit(lambda v, a: model.apply(v, a))(
        variables, jnp.asarray(audio)[:, :, None]
    )
    assert len(fmaps) == len(ref_fmaps) == 3  # 2 MPD + 1 MRD
    for di, (mine_list, ref_list) in enumerate(zip(fmaps, ref_fmaps)):
        assert len(mine_list) == len(ref_list), di
        for li, (mine, theirs) in enumerate(zip(mine_list, ref_list)):
            theirs = theirs.numpy()
            mine = np.asarray(mine)
            if di < 2:  # MPD: ours (B, L, P, C) vs torch (B, C, L, P)
                mine = np.transpose(mine, (0, 3, 1, 2))
            else:  # MRD: ours (B, T, F, C) vs torch (B, C, T, F)
                mine = np.transpose(mine, (0, 3, 1, 2))
            np.testing.assert_allclose(
                mine, theirs, atol=2e-4, rtol=1e-3,
                err_msg=f"disc {di} fmap {li}",
            )
