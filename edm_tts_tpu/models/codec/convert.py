"""Import reference (torch) DAC checkpoints into the flax codec param tree.

The reference's deployment surface is ``DAC.from_pretrained(<checkpoint>)``
(/root/reference/inference.py:27, modeling_dac.py:22); this module maps its
state dict — weight-normed Conv1d/ConvTranspose1d (g, v) pairs, Snake alphas,
and the per-level RVQ modules — onto our layout:

- torch Conv1d ``v`` is ``(out, in, k)``; ours is ``(k, in, out)``.
- torch ConvTranspose1d ``v`` is ``(in, out, k)``; ours is ``(k, in, out)``.
  Both keep weight-norm dim=0 semantics (per-out-channel for Conv1d, per-IN-
  channel for ConvTranspose1d), so ``g``/``v`` import verbatim (transposed)
  and the effective kernels match bit-for-bit in f32.
- the 12 per-level VQ modules (vector_quantizer.py:119-144) stack onto a
  leading Q axis (rvq.py runs them as one ``lax.scan``).

Handles both torch weight-norm state-dict namings: the legacy
``weight_g``/``weight_v`` and the parametrize-based
``parametrizations.weight.original0/1`` (torch >= 2.1 default).
"""

from __future__ import annotations

import numpy as np

from edm_tts_tpu.models.codec.config import CodecConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    # always copy: torch's .numpy() shares storage with the live tensor, and
    # on the CPU backend jnp.asarray is zero-copy too — without this, a torch
    # optimizer stepping the source model would silently mutate the
    # "converted" params.
    return np.array(x, dtype=np.float32)


def _wn_pair(sd: dict, prefix: str) -> tuple[np.ndarray, np.ndarray]:
    """(g, v) of a weight-normed torch conv, either naming scheme."""
    if f"{prefix}.weight_g" in sd:
        return _np(sd[f"{prefix}.weight_g"]), _np(sd[f"{prefix}.weight_v"])
    return (
        _np(sd[f"{prefix}.parametrizations.weight.original0"]),
        _np(sd[f"{prefix}.parametrizations.weight.original1"]),
    )


def _wnconv1d(sd: dict, prefix: str) -> dict:
    g, v = _wn_pair(sd, prefix)
    return {
        "v": np.transpose(v, (2, 1, 0)),  # (out,in,k) -> (k,in,out)
        "g": g.reshape(-1),
        "b": _np(sd[f"{prefix}.bias"]),
    }


def _wnconvt1d(sd: dict, prefix: str) -> dict:
    g, v = _wn_pair(sd, prefix)
    return {
        "v": np.transpose(v, (2, 0, 1)),  # (in,out,k) -> (k,in,out)
        "g": g.reshape(-1),  # per input channel (torch weight_norm dim=0)
        "b": _np(sd[f"{prefix}.bias"]),
    }


def _alpha(sd: dict, key: str) -> np.ndarray:
    return _np(sd[key]).reshape(-1)  # (1,C,1) -> (C,)


def _residual_unit(sd: dict, prefix: str) -> dict:
    """Reference ResidualUnit.block = [Snake, WNConv k7, Snake, WNConv k1]
    (nn_layers.py:35-47) -> our flat alpha1/conv7/alpha2/conv1 params."""
    c7 = _wnconv1d(sd, f"{prefix}.block.1")
    c1 = _wnconv1d(sd, f"{prefix}.block.3")
    return {
        "alpha1": _alpha(sd, f"{prefix}.block.0.alpha"),
        "conv7_v": c7["v"],
        "conv7_g": c7["g"],
        "conv7_b": c7["b"],
        "alpha2": _alpha(sd, f"{prefix}.block.2.alpha"),
        "conv1_v": c1["v"],
        "conv1_g": c1["g"],
        "conv1_b": c1["b"],
    }


def _encoder(sd: dict, n_blocks: int) -> dict:
    """Reference Encoder.block = [stem, EncoderBlock x N, Snake, final]
    (encoder.py:32-58)."""
    p: dict = {"WNConv1d_0": _wnconv1d(sd, "encoder.block.0")}
    for i in range(n_blocks):
        b = f"encoder.block.{i + 1}.block"
        p[f"EncoderBlock_{i}"] = {
            "ResidualUnit_0": _residual_unit(sd, f"{b}.0"),
            "ResidualUnit_1": _residual_unit(sd, f"{b}.1"),
            "ResidualUnit_2": _residual_unit(sd, f"{b}.2"),
            "Snake_0": {"alpha": _alpha(sd, f"{b}.3.alpha")},
            "WNConv1d_0": _wnconv1d(sd, f"{b}.4"),
        }
    p["Snake_0"] = {"alpha": _alpha(sd, f"encoder.block.{n_blocks + 1}.alpha")}
    p["WNConv1d_1"] = _wnconv1d(sd, f"encoder.block.{n_blocks + 2}")
    return p


def _decoder(sd: dict, n_blocks: int) -> dict:
    """Reference Decoder.model = [stem, DecoderBlock x N, Snake, final, Tanh]
    (decoder.py:33-62)."""
    p: dict = {"WNConv1d_0": _wnconv1d(sd, "decoder.model.0")}
    for i in range(n_blocks):
        b = f"decoder.model.{i + 1}.block"
        p[f"DecoderBlock_{i}"] = {
            "Snake_0": {"alpha": _alpha(sd, f"{b}.0.alpha")},
            "WNConvTranspose1d_0": _wnconvt1d(sd, f"{b}.1"),
            "ResidualUnit_0": _residual_unit(sd, f"{b}.2"),
            "ResidualUnit_1": _residual_unit(sd, f"{b}.3"),
            "ResidualUnit_2": _residual_unit(sd, f"{b}.4"),
        }
    p["Snake_0"] = {"alpha": _alpha(sd, f"decoder.model.{n_blocks + 1}.alpha")}
    p["WNConv1d_1"] = _wnconv1d(sd, f"decoder.model.{n_blocks + 2}")
    return p


def _quantizer(sd: dict, n_codebooks: int) -> dict:
    """Stack the per-level VQ modules (vector_quantizer.py:24-31) onto the
    leading Q axis of our scan-stacked ResidualVQ (rvq.py:76-99)."""
    in_v, in_g, in_b, cb, out_v, out_g, out_b = [], [], [], [], [], [], []
    for i in range(n_codebooks):
        q = f"quantizer.quantizers.{i}"
        g, v = _wn_pair(sd, f"{q}.in_proj")
        in_v.append(v[:, :, 0].T)  # (dc,in,1) -> (in,dc)
        in_g.append(g.reshape(-1))
        in_b.append(_np(sd[f"{q}.in_proj.bias"]))
        cb.append(_np(sd[f"{q}.codebook.weight"]))
        g, v = _wn_pair(sd, f"{q}.out_proj")
        out_v.append(v[:, :, 0].T)  # (d,dc,1) -> (dc,d)
        out_g.append(g.reshape(-1))
        out_b.append(_np(sd[f"{q}.out_proj.bias"]))
    return {
        "in_proj_v": np.stack(in_v),
        "in_proj_g": np.stack(in_g),
        "in_proj_b": np.stack(in_b),
        "codebook": np.stack(cb),
        "out_proj_v": np.stack(out_v),
        "out_proj_g": np.stack(out_g),
        "out_proj_b": np.stack(out_b),
    }


def _wnconv2d(sd: dict, prefix: str) -> dict:
    """torch WNConv2d (out,in,kh,kw) -> NHWC (kh,kw,in,out) v/g/b."""
    g, v = _wn_pair(sd, prefix)
    return {
        "v": np.transpose(v, (2, 3, 1, 0)),
        "g": g.reshape(-1),
        "b": _np(sd[f"{prefix}.bias"]),
    }


def discriminator_from_torch_state_dict(cfg, sd: dict) -> dict:
    """Reference ``DACDiscriminator`` state dict -> flax Discriminator tree.

    The reference orders ``discriminators.{i}`` as MPDs, MSDs, MRDs
    (discriminators.py:269-273); conv layers sit behind a
    ``Sequential(conv, LeakyReLU)`` (index .0) except the act=False posts.
    ``cfg`` is our DiscriminatorConfig (periods/rates/fft_sizes/bands).
    """
    p: dict = {}
    di = 0
    for period in cfg.periods:
        base = f"discriminators.{di}"
        mp: dict = {}
        for j in range(5):
            mp[f"WNConv2d_{j}"] = _wnconv2d(sd, f"{base}.convs.{j}.0")
        mp["WNConv2d_5"] = _wnconv2d(sd, f"{base}.conv_post")
        p[f"mpd_{period}"] = mp
        di += 1
    for rate in cfg.rates:
        base = f"discriminators.{di}"
        ms: dict = {}
        for j in range(6):
            g, v = _wn_pair(sd, f"{base}.convs.{j}.0")
            ms[f"WNConv1dDisc_{j}"] = {
                "v": np.transpose(v, (2, 1, 0)),  # (out,in/g,k)->(k,in/g,out)
                "g": g.reshape(-1),
                "b": _np(sd[f"{base}.convs.{j}.0.bias"]),
            }
        g, v = _wn_pair(sd, f"{base}.conv_post")
        ms["WNConv1dDisc_6"] = {
            "v": np.transpose(v, (2, 1, 0)),
            "g": g.reshape(-1),
            "b": _np(sd[f"{base}.conv_post.bias"]),
        }
        p[f"msd_{rate}"] = ms
        di += 1
    for fft in cfg.fft_sizes:
        base = f"discriminators.{di}"
        mr: dict = {}
        for bi in range(len(cfg.bands)):
            for li in range(5):
                mr[f"band{bi}_conv{li}"] = _wnconv2d(
                    sd, f"{base}.band_convs.{bi}.{li}.0"
                )
        mr["conv_post"] = _wnconv2d(sd, f"{base}.conv_post")
        p[f"mrd_{fft}"] = mr
        di += 1
    return {"params": p}


def discriminator_to_torch_state_dict(
    cfg, variables: dict, legacy_wn: bool = False
) -> dict:
    """Flax Discriminator tree -> reference ``DACDiscriminator`` state dict.

    Exact inverse of ``discriminator_from_torch_state_dict`` (bit-exact
    round trip). Note: when the real torchaudio is present, the reference
    MRD registers persistent ``window`` buffers from its Spectrogram
    transforms — those are deterministic hann windows, not weights; load
    with ``strict=False`` in that case (they re-initialize identically).
    """
    p = variables["params"]
    out: dict = {}

    def conv2d(src: dict, prefix: str) -> None:
        gk, vk = _wn_keys(prefix, legacy_wn)
        out[gk] = _f32(src["g"]).reshape(-1, 1, 1, 1)
        # NHWC (kh,kw,in,out) -> (out,in,kh,kw)
        out[vk] = np.transpose(_f32(src["v"]), (3, 2, 0, 1))
        out[f"{prefix}.bias"] = _f32(src["b"])

    def conv1d(src: dict, prefix: str) -> None:
        gk, vk = _wn_keys(prefix, legacy_wn)
        out[gk] = _f32(src["g"]).reshape(-1, 1, 1)
        out[vk] = np.transpose(_f32(src["v"]), (2, 1, 0))  # (k,in/g,out)
        out[f"{prefix}.bias"] = _f32(src["b"])

    di = 0
    for period in cfg.periods:
        base = f"discriminators.{di}"
        mp = p[f"mpd_{period}"]
        for j in range(5):
            conv2d(mp[f"WNConv2d_{j}"], f"{base}.convs.{j}.0")
        conv2d(mp["WNConv2d_5"], f"{base}.conv_post")
        di += 1
    for rate in cfg.rates:
        base = f"discriminators.{di}"
        ms = p[f"msd_{rate}"]
        for j in range(6):
            conv1d(ms[f"WNConv1dDisc_{j}"], f"{base}.convs.{j}.0")
        conv1d(ms["WNConv1dDisc_6"], f"{base}.conv_post")
        di += 1
    for fft in cfg.fft_sizes:
        base = f"discriminators.{di}"
        mr = p[f"mrd_{fft}"]
        for bi in range(len(cfg.bands)):
            for li in range(5):
                conv2d(mr[f"band{bi}_conv{li}"], f"{base}.band_convs.{bi}.{li}.0")
        conv2d(mr["conv_post"], f"{base}.conv_post")
        di += 1
    return {k: np.ascontiguousarray(v) for k, v in out.items()}


def from_torch_state_dict(cfg: CodecConfig, sd: dict) -> dict:
    """Reference ``DAC`` state dict (tensors or ndarrays) -> flax variables."""
    n_enc = len(cfg.encoder_rates)
    n_dec = len(cfg.decoder_rates)
    return {
        "params": {
            "encoder": _encoder(sd, n_enc),
            "quantizer": _quantizer(sd, cfg.n_codebooks),
            "decoder": _decoder(sd, n_dec),
        }
    }


# ---------------------------------------------------------------------------
# Reverse direction: flax -> reference torch state dict (export). Exact
# inverse of the import above (transposes/reshapes only), so torch -> flax ->
# torch round-trips bit-identically in f32. The weight-norm naming matches
# torch's parametrize scheme (``parametrizations.weight.original0/1``, the
# form this torch emits and ``_wn_pair`` accepts); pass ``legacy_wn=True``
# for the old ``weight_g``/``weight_v`` names.


def _f32(x) -> np.ndarray:
    return np.array(np.asarray(x), dtype=np.float32)


def _wn_keys(prefix: str, legacy_wn: bool) -> tuple[str, str]:
    if legacy_wn:
        return f"{prefix}.weight_g", f"{prefix}.weight_v"
    return (
        f"{prefix}.parametrizations.weight.original0",
        f"{prefix}.parametrizations.weight.original1",
    )


def _wnconv1d_to_torch(out: dict, p: dict, prefix: str, legacy_wn: bool) -> None:
    gk, vk = _wn_keys(prefix, legacy_wn)
    out[gk] = _f32(p["g"]).reshape(-1, 1, 1)  # (out,) -> (out,1,1)
    out[vk] = np.transpose(_f32(p["v"]), (2, 1, 0))  # (k,in,out) -> (out,in,k)
    out[f"{prefix}.bias"] = _f32(p["b"])


def _wnconvt1d_to_torch(out: dict, p: dict, prefix: str, legacy_wn: bool) -> None:
    gk, vk = _wn_keys(prefix, legacy_wn)
    out[gk] = _f32(p["g"]).reshape(-1, 1, 1)  # (in,) -> (in,1,1)
    out[vk] = np.transpose(_f32(p["v"]), (1, 2, 0))  # (k,in,out) -> (in,out,k)
    out[f"{prefix}.bias"] = _f32(p["b"])


def _snake_to_torch(out: dict, alpha, key: str) -> None:
    out[key] = _f32(alpha).reshape(1, -1, 1)  # (C,) -> (1,C,1)


def _residual_unit_to_torch(out: dict, p: dict, prefix: str, legacy_wn: bool) -> None:
    _snake_to_torch(out, p["alpha1"], f"{prefix}.block.0.alpha")
    _wnconv1d_to_torch(
        out,
        {"v": p["conv7_v"], "g": p["conv7_g"], "b": p["conv7_b"]},
        f"{prefix}.block.1",
        legacy_wn,
    )
    _snake_to_torch(out, p["alpha2"], f"{prefix}.block.2.alpha")
    _wnconv1d_to_torch(
        out,
        {"v": p["conv1_v"], "g": p["conv1_g"], "b": p["conv1_b"]},
        f"{prefix}.block.3",
        legacy_wn,
    )


def to_torch_state_dict(
    cfg: CodecConfig, variables: dict, legacy_wn: bool = False
) -> dict:
    """Flax codec variables -> reference ``DAC`` state dict (np.float32).

    Loadable by the reference ``DAC`` via ``load_state_dict`` / safetensors
    export (modeling_dac.py:22; the reference has no non-parameter buffers).
    """
    p = variables["params"]
    out: dict = {}

    enc = p["encoder"]
    n_enc = len(cfg.encoder_rates)
    _wnconv1d_to_torch(out, enc["WNConv1d_0"], "encoder.block.0", legacy_wn)
    for i in range(n_enc):
        b = f"encoder.block.{i + 1}.block"
        eb = enc[f"EncoderBlock_{i}"]
        for j in range(3):
            _residual_unit_to_torch(out, eb[f"ResidualUnit_{j}"], f"{b}.{j}", legacy_wn)
        _snake_to_torch(out, eb["Snake_0"]["alpha"], f"{b}.3.alpha")
        _wnconv1d_to_torch(out, eb["WNConv1d_0"], f"{b}.4", legacy_wn)
    _snake_to_torch(out, enc["Snake_0"]["alpha"], f"encoder.block.{n_enc + 1}.alpha")
    _wnconv1d_to_torch(out, enc["WNConv1d_1"], f"encoder.block.{n_enc + 2}", legacy_wn)

    q = p["quantizer"]
    for i in range(cfg.n_codebooks):
        qp = f"quantizer.quantizers.{i}"
        gk, vk = _wn_keys(f"{qp}.in_proj", legacy_wn)
        out[gk] = _f32(q["in_proj_g"][i]).reshape(-1, 1, 1)
        out[vk] = _f32(q["in_proj_v"][i]).T[:, :, None]  # (in,dc) -> (dc,in,1)
        out[f"{qp}.in_proj.bias"] = _f32(q["in_proj_b"][i])
        out[f"{qp}.codebook.weight"] = _f32(q["codebook"][i])
        gk, vk = _wn_keys(f"{qp}.out_proj", legacy_wn)
        out[gk] = _f32(q["out_proj_g"][i]).reshape(-1, 1, 1)
        out[vk] = _f32(q["out_proj_v"][i]).T[:, :, None]  # (dc,d) -> (d,dc,1)
        out[f"{qp}.out_proj.bias"] = _f32(q["out_proj_b"][i])

    dec = p["decoder"]
    n_dec = len(cfg.decoder_rates)
    _wnconv1d_to_torch(out, dec["WNConv1d_0"], "decoder.model.0", legacy_wn)
    for i in range(n_dec):
        b = f"decoder.model.{i + 1}.block"
        db = dec[f"DecoderBlock_{i}"]
        _snake_to_torch(out, db["Snake_0"]["alpha"], f"{b}.0.alpha")
        _wnconvt1d_to_torch(out, db["WNConvTranspose1d_0"], f"{b}.1", legacy_wn)
        for j in range(3):
            _residual_unit_to_torch(
                out, db[f"ResidualUnit_{j}"], f"{b}.{j + 2}", legacy_wn
            )
    _snake_to_torch(out, dec["Snake_0"]["alpha"], f"decoder.model.{n_dec + 1}.alpha")
    _wnconv1d_to_torch(out, dec["WNConv1d_1"], f"decoder.model.{n_dec + 2}", legacy_wn)
    # contiguify: several entries are transpose VIEWS; serializers that dump
    # the raw buffer (safetensors) would otherwise write them in the wrong
    # element order
    return {k: np.ascontiguousarray(v) for k, v in out.items()}
