"""dump_tokens CLI end-to-end: tiny exported models + synthetic FLAC data ->
token shards on disk -> readable and aligned (the reference's
utility_scripts/dump_tokens surface)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.flac_encoder import encode_flac


@pytest.mark.slow
def test_dump_tokens_cli(tmp_path, monkeypatch):
    from edm_tts_tpu.data.token_shards import iter_token_shards
    from edm_tts_tpu.models.codec import Codec, CodecConfig
    from edm_tts_tpu.models.hubert import HubertModel
    from edm_tts_tpu.models.hubert.config import HubertConfig
    from edm_tts_tpu.utils.hub import save_codec, save_hubert

    # --- tiny models on disk ---
    codec_cfg = CodecConfig(encoder_dim=4, decoder_dim=32, n_codebooks=2,
                            codebook_size=8, codebook_dim=4)
    codec = Codec(codec_cfg)
    codec_params = jax.jit(codec.init)(jax.random.PRNGKey(0),
                                       jnp.zeros((1, 640, 1)))
    save_codec(str(tmp_path / "codec"), codec, codec_params)

    hub_cfg = HubertConfig(
        conv_dim=(8,) * 7, conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_stride=(5, 2, 2, 2, 2, 2, 2), hidden_size=16,
        num_hidden_layers=1, num_attention_heads=4, intermediate_size=32,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    )
    hub_params = jax.jit(HubertModel(hub_cfg).init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 1280))
    )
    save_hubert(str(tmp_path / "hubert"), hub_cfg, hub_params,
                np.random.default_rng(0).standard_normal((8, 16)))

    # --- tiny dataset ---
    data = tmp_path / "data"
    (data / "small" / "spk").mkdir(parents=True)
    sr = 16000
    t = np.arange(sr) / sr
    for i in range(3):
        wav = (0.2 * np.sin(2 * np.pi * (200 + 50 * i) * t) * 32767).astype(np.int64)
        (data / "small" / "spk" / f"u{i}.flac").write_bytes(
            encode_flac(wav[None], sample_rate=sr, subframe_kind="fixed",
                        order=2, param=12)
        )

    out = tmp_path / "shards"
    sys.path.insert(0, "utility_scripts")
    import dump_tokens

    monkeypatch.setattr(sys, "argv", [
        "dump_tokens.py", "--dataset", "librilight", "--data_dir", str(data),
        "--subset", "small", "--output_dir", str(out),
        "--codec_model", str(tmp_path / "codec"),
        "--hubert_model", str(tmp_path / "hubert"),
        "--batch_size", "2", "--dtype", "float32", "--segment_seconds", "1.0",
    ])
    dump_tokens.main()

    items = list(iter_token_shards(str(out)))
    assert len(items) == 3
    for it in items:
        a, s = it["acoustic_tokens"], it["semantic_tokens"]
        assert a.shape[0] == 2
        assert a.shape[1] == s.shape[0] == sr // 320  # 1 s -> 50 tokens
        assert (a >= 0).all() and (a < 8).all()
        assert (s >= 0).all() and (s < 8).all()
