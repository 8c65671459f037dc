"""VQA BERT model + report trainer tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

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


def test_vqa_bert_lora_identity_at_init():
    """BERT q/k/v LoRA (vqa.py:359-366) starts as identity: lora_b is zero, so
    grafting base weights into the LoRA tree reproduces base logits exactly."""
    video = _video(1)
    ids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    mask = jnp.ones((1, 4), jnp.int32)

    base = MedicalVQAModel(BERT, VIT, vision_dim=32)
    lora = MedicalVQAModel(BERT, VIT, vision_dim=32, lora_rank=16, lora_alpha=32.0)
    p_base = base.init(jax.random.key(0), video, ids, mask)
    p_lora = lora.init(jax.random.key(0), video, ids, mask)

    # base tree is a strict subtree of the lora tree (lora adds *_lora_a/b next
    # to the q/k/v Dense params) -> graft shared leaves from base
    def graft(lp, bp):
        if isinstance(lp, dict):
            return {k: graft(v, bp[k]) if k in bp else v for k, v in lp.items()}
        return bp

    grafted = {"params": graft(p_lora["params"], p_base["params"])}
    lg = lora.apply(grafted, video, ids, mask)
    bg = base.apply(p_base, video, ids, mask)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(bg), rtol=1e-5, atol=1e-5)


def test_vqa_bert_masked_training_updates_only_lora_and_heads():
    """One masked-optimizer step: BERT base + CTViT trunk frozen; LoRA,
    cross-attention, projections, fusion and lm_head move (peft semantics of
    vqa.py:359-376)."""
    from ctpa.models.vqa_bert import make_vqa_optimizer, vqa_trainable_mask

    model = MedicalVQAModel(BERT, VIT, vision_dim=32, lora_rank=4, lora_alpha=8.0)
    video = _video(2)
    ids = jnp.asarray([[5, 6, 7, 8], [9, 10, 2, 0]], jnp.int32)
    mask = (ids != 0).astype(jnp.int32)
    params = model.init(jax.random.key(0), video, ids, mask)
    tx = make_vqa_optimizer(params, t_max=10)
    opt_state = tx.init(params)

    loss, grads = jax.value_and_grad(
        lambda p: model.apply(p, video, ids, mask, method=MedicalVQAModel.loss)
    )(params)
    assert np.isfinite(float(loss))
    updates, _ = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    trainable = vqa_trainable_mask(params)
    flat_old = jax.tree_util.tree_leaves_with_path(params)
    flat_new = dict(jax.tree_util.tree_leaves_with_path(new_params))
    flat_mask = dict(jax.tree_util.tree_leaves_with_path(trainable))
    moved_frozen, moved_trainable, total_trainable = [], 0, 0
    for path, old in flat_old:
        changed = not np.allclose(np.asarray(old), np.asarray(flat_new[path]))
        if flat_mask[path]:
            total_trainable += 1
            moved_trainable += int(changed)
        elif changed:
            moved_frozen.append(jax.tree_util.keystr(path))
    assert not moved_frozen, f"frozen params moved: {moved_frozen[:5]}"
    # lora_a has zero grad at init (since b=0 the delta path contributes, but
    # d loss/d a = x^T (g b^T) != 0 in general); require most trainables moved
    assert moved_trainable >= total_trainable * 0.5
    # and specifically at least one LoRA leaf moved
    lora_moved = [
        jax.tree_util.keystr(p) for p, old in flat_old
        if "lora_b" in jax.tree_util.keystr(p)
        and not np.allclose(np.asarray(old), np.asarray(flat_new[p]))
    ]
    assert lora_moved, "no lora_b leaf moved"


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


def test_partitioned_step_matches_masked_full_grad():
    """make_partitioned_report_step differentiates only trainable leaves;
    its updates must equal the full-grad+mask step's, and frozen leaves must
    be bit-identical after the step (7B LoRA fine-tunes rely on this: a
    full-tree grad is another 13.5 GB)."""
    from ctpa.train.report_trainer import (
        make_partitioned_report_step, make_report_train_step,
        trainable_labels)

    lora = LoRAConfig(rank=2, alpha=4.0, target_projections=("q_proj", "v_proj"))
    gen_cfg = ReportGenConfig(vision_dim=32)
    model = CTReportGenerator(LLM, VIT, gen_cfg, lora=lora)
    video = _video(1)
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    mask = jnp.ones((1, 4), jnp.int32)
    params = model.init(jax.random.key(0), video, ids, mask)
    batch = {"video": video, "input_ids": ids, "attention_mask": mask}

    tx = make_report_optimizer(params, gen_cfg, total_steps=10)
    full_state = SimpleTrainState.create(params, tx)
    full_step = jax.jit(make_report_train_step(model, tx))
    fs, fm = full_step(full_state, batch)

    part_step, opt0 = make_partitioned_report_step(model, params, gen_cfg,
                                                   total_steps=10)
    ps, pm = jax.jit(part_step)(
        SimpleTrainState(params=params, opt_state=opt0,
                         step=jnp.zeros((), jnp.int32)), batch)

    np.testing.assert_allclose(float(pm["loss"]), float(fm["loss"]), rtol=1e-5)
    labels = trainable_labels(params)
    flat_f = jax.tree_util.tree_flatten_with_path(fs.params)[0]
    flat_p = {jax.tree_util.keystr(kp): v
              for kp, v in jax.tree_util.tree_flatten_with_path(ps.params)[0]}
    flat_0 = {jax.tree_util.keystr(kp): v
              for kp, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    flat_l = {jax.tree_util.keystr(kp): v
              for kp, v in jax.tree_util.tree_flatten_with_path(labels)[0]}
    n_trained = n_moved = 0
    for kp, f_leaf in flat_f:
        k = jax.tree_util.keystr(kp)
        p_leaf = flat_p[k]
        if flat_l[k] == "frozen":
            assert bool(jnp.all(p_leaf == flat_0[k])), k
        else:
            n_trained += 1
            np.testing.assert_allclose(np.asarray(p_leaf), np.asarray(f_leaf),
                                       rtol=2e-4, atol=2e-5, err_msg=k)
            n_moved += int(not bool(jnp.all(p_leaf == flat_0[k])))
    # most trainables moved (zero-init biases can have exactly-zero grads)
    assert n_trained > 0 and n_moved >= n_trained * 0.5


def test_loss_from_vision_matches_loss():
    """Precomputed-vision loss path == video loss path, and the partitioned
    step accepts a 'vision' batch."""
    from ctpa.train.report_trainer import make_partitioned_report_step
    from ctpa.train.train_state import SimpleTrainState

    lora = LoRAConfig(rank=2, alpha=4.0, target_projections=("q_proj",))
    gen_cfg = ReportGenConfig(vision_dim=32)
    model = CTReportGenerator(LLM, VIT, gen_cfg, lora=lora)
    video = _video(1)
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    mask = jnp.ones((1, 4), jnp.int32)
    params = model.init(jax.random.key(0), video, ids, mask)

    want = model.apply(params, video, ids, mask,
                       method=CTReportGenerator.loss)
    vision = model.apply(params, video, method=CTReportGenerator.extract_vision)
    got = model.apply(params, vision, ids, mask,
                      method=CTReportGenerator.loss_from_vision)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    step_fn, opt0 = make_partitioned_report_step(model, params, gen_cfg,
                                                 total_steps=10)
    st = SimpleTrainState(params=params, opt_state=opt0,
                          step=jnp.zeros((), jnp.int32))
    _, m = jax.jit(step_fn)(st, {"vision": vision, "input_ids": ids,
                                 "attention_mask": mask})
    np.testing.assert_allclose(float(m["loss"]), float(want), rtol=1e-5)
