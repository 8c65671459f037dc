"""CLIP trainer tests: pjit'd step over the 8-device virtual mesh, global-batch
negatives, schedule/optimizer parity, checkpoint roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctpa.core.config import (
    BertConfig, CTCLIPConfig, CTViTConfig, OptimizerConfig, TrainConfig,
)
from ctpa.models.ctclip import CTCLIP, contrastive_loss_sharded, infonce_loss
from ctpa.ops.vq import vq_init
from ctpa.train.clip_trainer import CTClipTrainer, make_clip_train_step
from ctpa.train.optim import cosine_warmup_restarts, get_optimizer, onecycle, weight_decay_mask
from ctpa.train.train_state import CLIPTrainState

VIT = CTViTConfig.tiny()
BERT = BertConfig.tiny()
CLIP = CTCLIPConfig.tiny(VIT, BERT)


def make_batch(b, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_ids": rng.integers(1, BERT.vocab_size, size=(b, 8)).astype(np.int32),
        "attention_mask": np.ones((b, 8), np.int32),
        "video": rng.normal(size=(b, 1, VIT.temporal_size, VIT.image_size, VIT.image_size)).astype(np.float32),
    }


def make_model_state():
    model = CTCLIP(CLIP, VIT, BERT)
    vq_state = vq_init(jax.random.key(0), VIT.codebook_size, VIT.dim)
    b = make_batch(2)
    params = model.init(
        jax.random.key(0), jnp.asarray(b["input_ids"]), jnp.asarray(b["attention_mask"]),
        jnp.asarray(b["video"]), vq_state,
    )
    tx = get_optimizer(OptimizerConfig(lr=1e-3), params)
    return model, tx, CLIPTrainState.create(params, tx, vq_state)


@pytest.mark.slow
def test_train_step_descends_singledevice():
    model, tx, state = make_model_state()
    step = jax.jit(make_clip_train_step(model, tx), donate_argnums=())
    batch = jax.tree.map(jnp.asarray, make_batch(4))
    losses = []
    for _ in range(5):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5
    # VQ EMA state moved
    assert float(jnp.abs(state.vq_state.cluster_size).sum()) > 0


@pytest.mark.slow
def test_train_step_sharded_mesh(mesh8, tmp_path):
    model, tx, state = make_model_state()

    def loader():
        i = 0
        while True:
            yield make_batch(8, seed=i)
            i += 1

    trainer = CTClipTrainer(
        model, state, loader(),
        cfg=TrainConfig(batch_size=8, num_train_steps=3, save_model_every=1000,
                        save_results_every=1000,
                        results_dir=str(tmp_path / "res"),
                        checkpoint_dir=str(tmp_path / "ckpt"),
                        precision="fp32"),
        opt_cfg=OptimizerConfig(lr=1e-3),
        mesh=mesh8,
    )
    m = trainer.train(3)
    assert np.isfinite(m["loss"])
    assert int(trainer.state.step) == 3


@pytest.mark.slow
def test_finetune_mask_freezes_non_tower_params(tmp_path):
    """Reference fine-tune semantics (fine_tuning_ctclip.py:5-15): both towers
    train, latent projections and temperature stay frozen."""
    from ctpa.train.clip_trainer import clip_finetune_mask

    model, tx, state = make_model_state()

    def loader():
        i = 0
        while True:
            yield make_batch(4, seed=i)
            i += 1

    trainer = CTClipTrainer(
        model, state, loader(),
        cfg=TrainConfig(batch_size=4, num_train_steps=2, save_model_every=1000,
                        save_results_every=1000,
                        results_dir=str(tmp_path / "res"),
                        checkpoint_dir=str(tmp_path / "ckpt"),
                        precision="fp32"),
        opt_cfg=OptimizerConfig(lr=1e-2),
        trainable_mask=clip_finetune_mask,
    )
    before = jax.tree.map(np.asarray, state.params)
    trainer.train(2)
    after = jax.tree.map(np.asarray, trainer.state.params)

    p0, p1 = before["params"], after["params"]
    assert np.array_equal(p0["temperature"], p1["temperature"])
    assert all(
        np.array_equal(a, b) for a, b in zip(
            jax.tree.leaves(p0["to_text_latent"]),
            jax.tree.leaves(p1["to_text_latent"])))
    moved = [
        not np.array_equal(a, b) for a, b in zip(
            jax.tree.leaves(p0["text_transformer"]),
            jax.tree.leaves(p1["text_transformer"]))
    ]
    assert any(moved)
    moved_v = [
        not np.array_equal(a, b) for a, b in zip(
            jax.tree.leaves(p0["visual_transformer"]),
            jax.tree.leaves(p1["visual_transformer"]))
    ]
    assert any(moved_v)


def test_global_negatives_match_local_computation(mesh8):
    """contrastive_loss_sharded over 8 shards == unsharded infonce on the
    global batch — the all-gather gives every shard the global loss."""
    from functools import partial
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    d = 16
    rng = np.random.default_rng(0)
    text = rng.normal(size=(16, d)).astype(np.float32)
    img = rng.normal(size=(16, d)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    temp = jnp.float32(5.0)

    want = infonce_loss(jnp.asarray(text) @ jnp.asarray(img).T * temp)

    fn = shard_map(
        lambda t, i: contrastive_loss_sharded(t, i, temp)[None],
        mesh=mesh8,
        in_specs=(P("data"), P("data")),
        out_specs=P("data"),
    )
    got = fn(jnp.asarray(text), jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(got), float(want), rtol=1e-5)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    model, tx, state = make_model_state()
    step = jax.jit(make_clip_train_step(model, tx), donate_argnums=())
    batch = jax.tree.map(jnp.asarray, make_batch(2))
    state, _ = step(state, batch)

    from ctpa.core.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(1, jax.device_get(state))
    mgr.wait()
    assert mgr.latest_step() == 1
    restored = mgr.restore(target=jax.device_get(state))
    lhs = jax.tree.leaves(restored.params)
    rhs = jax.tree.leaves(state.params)
    for a, b in zip(lhs, rhs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cosine_warmup_restarts_schedule():
    sched = cosine_warmup_restarts(eta_max=1.0, T_0=100, T_warmup=10)
    # linear warmup
    np.testing.assert_allclose(float(sched(0)), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(sched(5)), 0.5, atol=1e-6)
    # peak right after warmup
    np.testing.assert_allclose(float(sched(10)), 1.0, atol=1e-6)
    # cosine to ~0 at end of cycle, restart to peak
    np.testing.assert_allclose(float(sched(110)), 1.0, atol=1e-4)
    assert float(sched(60)) < 1.0


def test_onecycle_schedule():
    sched = onecycle(peak_lr=1.0, total_steps=100, pct_start=0.3)
    assert float(sched(0)) == pytest.approx(1 / 25, rel=1e-3)
    assert float(sched(30)) == pytest.approx(1.0, rel=1e-3)
    assert float(sched(100)) < 1e-3


def test_weight_decay_mask_rule():
    params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,)), "scalar": jnp.ones(())}
    mask = weight_decay_mask(params)
    assert mask["w"] is True or mask["w"] == True  # noqa: E712
    assert not mask["b"]
    assert not mask["scalar"]
