"""VQA BERT model + report trainer tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctpa.core.config import (
    BertConfig, CTViTConfig, LLMConfig, LoRAConfig, ReportGenConfig, TrainConfig,
)
from ctpa.models.report_generator import CTReportGenerator
from ctpa.models.vqa_bert import MedicalVQAModel
from ctpa.train.report_trainer import ReportTrainer, make_report_optimizer
from ctpa.train.train_state import SimpleTrainState

BERT = BertConfig.tiny()
VIT = CTViTConfig.tiny()
LLM = LLMConfig.tiny()


def _video(b=2):
    rng = np.random.default_rng(0)
    return jnp.asarray(
        rng.normal(size=(b, 1, VIT.temporal_size, VIT.image_size, VIT.image_size)),
        jnp.float32,
    )


def test_vqa_bert_forward_loss_generate():
    model = MedicalVQAModel(BERT, VIT, vision_dim=32)
    video = _video(2)
    ids = jnp.asarray([[5, 6, 7, 8], [9, 10, 0, 0]], jnp.int32)
    mask = (ids != 0).astype(jnp.int32)
    params = model.init(jax.random.key(0), video, ids, mask)
    logits = model.apply(params, video, ids, mask)
    assert logits.shape == (2, 4, BERT.vocab_size)
    loss = model.apply(params, video, ids, mask, method=MedicalVQAModel.loss)
    assert np.isfinite(float(loss))
    out_ids, lengths = model.apply(
        params, video, ids, mask, 4, 3, method=MedicalVQAModel.generate)
    assert out_ids.shape == (2, 8)
    assert int(lengths.max()) <= 4 + 4


def test_report_optimizer_freezing():
    """Frozen base LLM / CTViT params must receive zero updates; LoRA and
    cross-attention params must move."""
    lora = LoRAConfig(rank=2, alpha=4.0, target_projections=("q_proj", "v_proj"))
    gen_cfg = ReportGenConfig(vision_dim=32)
    model = CTReportGenerator(LLM, VIT, gen_cfg, lora=lora)
    video = _video(1)
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    mask = jnp.ones((1, 4), jnp.int32)
    params = model.init(jax.random.key(0), video, ids, mask)
    tx = make_report_optimizer(params, gen_cfg, total_steps=10)
    state = SimpleTrainState.create(params, tx)

    from ctpa.train.report_trainer import make_report_train_step

    step = jax.jit(make_report_train_step(model, tx))
    batch = {"video": video, "input_ids": ids, "attention_mask": mask}
    new_state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))

    flat_old = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_new = dict(jax.tree_util.tree_flatten_with_path(new_state.params)[0])
    moved, frozen_ok = 0, True
    for path, old in flat_old:
        key = jax.tree_util.keystr(path)
        new = flat_new[path]
        changed = not np.allclose(np.asarray(old), np.asarray(new))
        if "lora_" in key or "cross_attention" in key:
            moved += int(changed)
        elif "llm" in key and "base" in key:
            frozen_ok &= not changed
        elif "ctvit" in key:
            frozen_ok &= not changed
    assert moved > 0
    assert frozen_ok


def test_report_trainer_epoch_and_best_ckpt(tmp_path):
    gen_cfg = ReportGenConfig(vision_dim=32, llm_lr=1e-3, cross_attn_lr=1e-3)
    model = CTReportGenerator(LLM, VIT, gen_cfg)
    video = _video(2)
    ids = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    mask = jnp.ones((2, 4), jnp.int32)
    params = model.init(jax.random.key(0), video, ids, mask)
    tx = make_report_optimizer(params, gen_cfg, total_steps=20, train_full_llm=True)
    state = SimpleTrainState.create(params, tx)
    trainer = ReportTrainer(
        model, state, tx,
        cfg=TrainConfig(results_dir=str(tmp_path / "r"), checkpoint_dir=str(tmp_path / "c")),
        eval_fn=lambda s: {"composite": 0.4},
    )

    def loader():
        for _ in range(3):
            yield {"video": np.asarray(video), "input_ids": np.asarray(ids),
                   "attention_mask": np.asarray(mask)}

    out = trainer.train_epoch(loader(), epoch=0)
    assert np.isfinite(out["mean_loss"])
    trainer.ckpt.wait()
    assert len(trainer.ckpt.all_steps()) >= 1  # best-by-loss + best-by-val saved
