"""Differential multi-step TRAINING TRAJECTORY parity for the two token
models: our real ``Trainer`` step (jitted value_and_grad + the optax recipe
from train/optim.py) vs the reference torch models optimized with the exact
HF-Trainer sequence (zero_grad -> loss.backward -> clip_grad_norm_(0.5) ->
AdamW.step -> cosine-warmup scheduler.step; betas (0.8, 0.99), wd 0.0 —
configs/*/train_config.yaml:62-70 in the reference).

Loss-value parity (test_train_loss_parity.py) checks the forward objective;
optimizer parity (test_optim_parity.py) checks the update rule on injected
grads. This test closes the remaining gap — GRADIENT parity of the whole
backward pass (conformer blocks, RoPE attention, GLU convs, EinMix heads,
the injection machinery, the frozen-codec masking) — because step N's loss
depends on step N-1's updated parameters on each side. Masks are pinned
per step on both sides; step-1 grad norms are compared directly for t2s
(all params trainable on both sides there).
"""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from transformers import get_cosine_schedule_with_warmup

from edm_tts_tpu.models.codec import CodecConfig
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig
from edm_tts_tpu.models.s2a.convert import from_torch_state_dict as s2a_convert
from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic
from edm_tts_tpu.models.t2s.convert import from_torch_state_dict as t2s_convert
from edm_tts_tpu.train.optim import freeze_subtree_mask
from edm_tts_tpu.train.trainer import Trainer, TrainingArguments
from reference_torch import install_reference_path

install_reference_path()

from edm_tts.models.dac.configuration import DACConfig  # noqa: E402
from edm_tts.models.dac.modeling_dac import DAC  # noqa: E402
from edm_tts.models.injection_conformer.configuration import (  # noqa: E402
    InjectionConformerConfig,
)
from edm_tts.models.injection_conformer.modeling_injection_conformer import (  # noqa: E402
    InjectionConformerModel,
)
from edm_tts.models.text_to_semantic.configuration import (  # noqa: E402
    TextToSemanticWLenConfig,
)
from edm_tts.models.text_to_semantic.modeling_text_to_semantic import (  # noqa: E402
    TextToSemanticWLen,
)

H, V_SEM, V_TXT = 32, 24, 16
N_STEPS, WARMUP, TOTAL = 4, 1, 8
LR, CLIP = 2.5e-4, 0.5


def _torch_recipe_step(model, opt, sched, loss):
    """One HF-Trainer optimization step (Trainer.training_step +
    _inner_training_loop clip/step/schedule ordering)."""
    opt.zero_grad(set_to_none=True)
    loss.backward()
    norm = torch.nn.utils.clip_grad_norm_(
        [p for p in model.parameters() if p.requires_grad], CLIP
    )
    opt.step()
    sched.step()
    return float(norm)


def _make_opt(model):
    opt = torch.optim.AdamW(
        [p for p in model.parameters() if p.requires_grad],
        lr=LR,
        betas=(0.8, 0.99),
        eps=1e-8,
        weight_decay=0.0,
    )
    return opt, get_cosine_schedule_with_warmup(opt, WARMUP, TOTAL)


def _make_trainer(tmp, loss_fn, params, frozen_mask=None):
    from edm_tts_tpu.parallel.mesh import make_mesh

    args = TrainingArguments(
        output_dir=tmp,
        max_steps=TOTAL,
        learning_rate=LR,
        warmup_steps=WARMUP,
        weight_decay=0.0,
        adam_beta1=0.8,
        adam_beta2=0.99,
        adam_epsilon=1e-8,
        max_grad_norm=CLIP,
        overwrite_output_dir=True,
    )
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    return Trainer(args, loss_fn, params, frozen_mask=frozen_mask, mesh=mesh)


def _tolerances():
    # cross-impl f32 grad noise compounds with each update
    return [2e-3, 4e-3, 8e-3, 1.5e-2]


# ---------------------------------------------------------------- t2s


def test_t2s_training_trajectory_parity(tmp_path):
    torch.manual_seed(4)
    kw = dict(
        hidden_size=H,
        semantic_vocab_size=V_SEM,
        text_vocab_size=V_TXT,
        main_encoder_num_heads=4,
        main_encoder_num_layers=2,
        main_encoder_ff_mult=2,
        length_predictor_num_heads=4,
        length_predictor_num_layers=1,
        length_predictor_ff_mult=2,
    )
    ref = TextToSemanticWLen(TextToSemanticWLenConfig(attn_flash=False, **kw))
    ref.train()  # no dropout fields in this model; train mode for parity of intent
    cfg = T2SConfig(**kw)
    model = TextToSemantic(cfg)
    variables = jax.tree.map(jnp.asarray, t2s_convert(cfg, ref.state_dict()))

    rng = np.random.default_rng(5)
    b, l = 2, 20
    batches = []
    for _ in range(N_STEPS):
        texts = [list(rng.integers(5, V_TXT, rng.integers(3, 6))) for _ in range(b)]
        speeches = [
            list(rng.integers(21, 21 + V_SEM, rng.integers(6, 11)))
            for _ in range(b)
        ]
        row_masks = [list(rng.random(len(s)) < 0.6) for s in speeches]
        ids = np.zeros((b, l), np.int64)
        attn = np.zeros((b, l), bool)
        speech_mask = np.zeros((b, l), bool)
        full_mask = np.zeros((b, l), bool)
        text_ids = np.zeros((b, 8), np.int64)
        for i, (txt, sp, m) in enumerate(zip(texts, speeches, row_masks)):
            row = [1] + txt + [3, 2] + sp + [3]
            ids[i, : len(row)] = row
            attn[i, : len(row)] = True
            s0 = 3 + len(txt)
            speech_mask[i, s0 : s0 + len(sp)] = True
            full_mask[i, s0 : s0 + len(sp)] = m
            text_ids[i, : len(txt)] = txt
        batches.append(
            dict(
                ids=ids,
                attn=attn,
                speech_mask=speech_mask,
                full_mask=full_mask,
                text_ids=text_ids,
                row_masks=row_masks,
                lengths=np.asarray([len(s) for s in speeches], np.float32),
            )
        )

    # ---- reference side
    opt, sched = _make_opt(ref)
    pending = []
    ref.cosine_schedule_mask = lambda n: pending.pop(0)
    ref_losses, ref_norms = [], []
    for bt in batches:
        pending.extend(torch.tensor(m) for m in bt["row_masks"])
        out = ref(torch.from_numpy(bt["ids"]), torch.from_numpy(bt["attn"]))
        ref_losses.append(out.loss.item())
        ref_norms.append(_torch_recipe_step(ref, opt, sched, out.loss))

    # ---- our side (the real Trainer step)
    def loss_fn(p, batch, rng_):
        out = model.apply(
            p,
            batch["ids"],
            batch["attn"],
            batch["speech_mask"],
            batch["text_ids"],
            batch["text_ids"] != 0,
            batch["lengths"],
            mask_rng=rng_,
            mask_override=batch["full_mask"],
            train=False,
        )
        return out["loss"], {}

    trainer = _make_trainer(str(tmp_path / "t2s"), loss_fn, variables)
    my_losses, my_norms = [], []
    state = trainer.state
    for bt in batches:
        dev = {
            k: jnp.asarray(v)
            for k, v in bt.items()
            if k in ("ids", "attn", "speech_mask", "full_mask", "text_ids", "lengths")
        }
        state, metrics = trainer._train_step(state, dev, jax.random.PRNGKey(0))
        my_losses.append(float(metrics["loss"]))
        my_norms.append(float(metrics["grad_norm"]))

    for i, (mine, theirs, tol) in enumerate(
        zip(my_losses, ref_losses, _tolerances())
    ):
        np.testing.assert_allclose(mine, theirs, rtol=tol, err_msg=f"step {i} loss")
    # unclipped global grad norm, step 1 (identical params on both sides)
    np.testing.assert_allclose(my_norms[0], ref_norms[0], rtol=5e-3)


# ---------------------------------------------------------------- s2a

Q, N = 4, 16


def test_s2a_training_trajectory_parity(tmp_path):
    torch.manual_seed(0)
    dac_cfg = DACConfig(
        encoder_dim=8,
        encoder_rates=[2, 4, 5, 8],
        decoder_dim=96,
        decoder_rates=[8, 5, 4, 2],
        n_codebooks=Q,
        codebook_size=N,
        codebook_dim=4,
        quantizer_dropout=0.0,
    )
    tmp = tempfile.mkdtemp()
    DAC(dac_cfg).save_pretrained(tmp)
    ref = InjectionConformerModel(
        InjectionConformerConfig(
            hidden_size=H,
            num_semantic_tokens=V_SEM,
            acoustic_model_path=tmp,
            encoder_num_heads=4,
            encoder_num_layers=4,
            encoder_ff_mult=2,
            encoder_attn_dropout=0.0,
            encoder_ff_dropout=0.0,
            encoder_conv_dropout=0.0,
            injection_layers=(1, 2),
            attn_flash=False,
        )
    )
    ref.train()  # teacher-injection branch; all dropouts 0
    cfg = S2AConfig(
        hidden_size=H,
        num_semantic_tokens=V_SEM,
        encoder_num_heads=4,
        encoder_num_layers=4,
        encoder_ff_mult=2,
        encoder_attn_dropout=0.0,
        encoder_ff_dropout=0.0,
        encoder_conv_dropout=0.0,
        injection_layers=(1, 2),
        codec=CodecConfig(
            encoder_dim=8,
            decoder_dim=96,
            n_codebooks=Q,
            codebook_size=N,
            codebook_dim=4,
            quantizer_dropout=0.0,
        ),
    )
    model = InjectionConformer(cfg)
    variables = jax.tree.map(jnp.asarray, s2a_convert(cfg, ref.state_dict()))

    rng = np.random.default_rng(6)
    b, t = 2, 12
    batches = [
        dict(
            ac=rng.integers(0, N, (b, Q, t)).astype(np.int64),
            sem=rng.integers(0, V_SEM, (b, t)).astype(np.int64),
            mask=rng.random((b, t)) < 0.5,
        )
        for _ in range(N_STEPS)
    ]

    # ---- reference side (frozen DAC: requires_grad=False set in __init__)
    opt, sched = _make_opt(ref)
    holder = {}
    ref.cosine_schedule_mask = lambda fl, bs: torch.from_numpy(holder["m"])
    ref_losses = []
    for bt in batches:
        holder["m"] = bt["mask"]
        out = ref(torch.from_numpy(bt["ac"]), torch.from_numpy(bt["sem"]))
        ref_losses.append(out.loss.item())
        _torch_recipe_step(ref, opt, sched, out.loss)

    # ---- our side (frozen codec subtree masked out of the update)
    def loss_fn(p, batch, rng_):
        out = model.apply(
            p,
            batch["ac"],
            batch["sem"],
            mask_rng=rng_,
            mask_override=batch["mask"],
            train=False,
        )
        return out["loss"], {}

    frozen = freeze_subtree_mask(variables, "codec")
    trainer = _make_trainer(
        str(tmp_path / "s2a"), loss_fn, variables, frozen_mask=frozen
    )
    my_losses = []
    state = trainer.state
    for bt in batches:
        dev = {k: jnp.asarray(v) for k, v in bt.items()}
        state, metrics = trainer._train_step(state, dev, jax.random.PRNGKey(0))
        my_losses.append(float(metrics["loss"]))

    for i, (mine, theirs, tol) in enumerate(
        zip(my_losses, ref_losses, _tolerances())
    ):
        np.testing.assert_allclose(mine, theirs, rtol=tol, err_msg=f"step {i} loss")
