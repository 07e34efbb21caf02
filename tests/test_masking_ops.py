"""Masking/sampling primitive semantics + on-device IIR parity."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import lfilter

from edm_tts_tpu.ops.loudness import _high_pass, _high_shelf, biquad_scan
from edm_tts_tpu.ops.masking import (
    cosine_schedule_mask,
    random_topk_mask,
    sampling_mask_ratios,
)


def test_random_topk_mask_masks_lowest_confidence():
    """At temperature -> 0, exactly the mask_len lowest-prob positions (below
    the cut-off) are re-masked; +inf positions never are."""
    probs = jnp.asarray([[0.1, 0.5, 0.2, jnp.inf, 0.9, 0.05]])
    mask = random_topk_mask(
        jax.random.PRNGKey(0), jnp.asarray([3.0]), probs, temperature=1e-9
    )
    m = np.asarray(mask[0])
    # cut_off = 3rd smallest confidence (0.5); strictly below -> {0.05,0.1,0.2}
    assert list(m) == [True, False, True, False, False, True]


def test_random_topk_mask_respects_inf():
    probs = jnp.full((2, 8), jnp.inf).at[:, :4].set(0.1)
    mask = random_topk_mask(
        jax.random.PRNGKey(1), jnp.asarray([2.0, 3.0]), probs
    )
    m = np.asarray(mask)
    assert not m[:, 4:].any()  # fixed positions never re-masked
    assert m[0].sum() <= 2 and m[1].sum() <= 3


def test_cosine_schedule_mask_rate_shared_per_sample():
    key = jax.random.PRNGKey(2)
    mask = cosine_schedule_mask(key, 4, 4096)
    rates = np.asarray(mask).mean(axis=1)
    assert ((rates >= 0) & (rates <= 1)).all()
    # the four samples should have visibly different rates (different u draws)
    assert np.std(rates) > 0.01


def test_sampling_mask_ratios_endpoints():
    r = np.asarray(sampling_mask_ratios(8))
    assert r[0] < 1.0 and abs(r[-1]) < 1e-6
    assert (np.diff(r) < 0).all()  # strictly decreasing


def test_biquad_scan_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 500)).astype(np.float32)
    for b, a in [_high_shelf(16000), _high_pass(16000)]:
        ours = np.asarray(biquad_scan(b, a, jnp.asarray(x)))
        ref = lfilter(b, a, x, axis=-1)
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


def test_random_topk_mask_matches_reference_torch():
    """Differential: our random_topk_mask vs the actual reference
    implementation (edm_tts/utils/utils.py:49-60) with the SAME gumbel noise
    injected into both — exact boolean equality across temperatures and
    mask lengths (incl. +inf already-committed positions)."""
    import torch

    from reference_torch import install_reference_path

    install_reference_path()
    from edm_tts.utils.utils import random_topk_mask as ref_topk

    rng = np.random.default_rng(0)
    b, t = 4, 24
    probs = rng.uniform(0.01, 1.0, (b, t))
    probs[0, 3] = np.inf  # committed position (sampler carry semantics)
    gumbel = rng.gumbel(size=(b, t))

    class FixedDist:
        def sample(self, shape):
            # reference calls distribution.sample(probs.shape) and squeezes
            # the trailing dim added by torch Gumbel's batch shape
            return torch.from_numpy(gumbel).unsqueeze(-1)

    for temperature in (0.0, 0.37, 1.0):
        for mask_len in ([1, 5, 10, 23], [0, 0, 0, 0]):
            ref = ref_topk(
                torch.tensor(mask_len, dtype=torch.float64),
                torch.from_numpy(probs),
                FixedDist(),
                temperature=temperature,
            ).numpy()
            mine = np.asarray(
                random_topk_mask(
                    jax.random.PRNGKey(0),
                    jnp.asarray(mask_len, jnp.float32),
                    jnp.asarray(probs, jnp.float32),
                    temperature=temperature,
                    gumbel=jnp.asarray(gumbel, jnp.float32),
                )
            )
            np.testing.assert_array_equal(mine, ref, err_msg=f"T={temperature}")
