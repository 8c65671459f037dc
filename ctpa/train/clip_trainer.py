"""Contrastive CLIP trainer — pjit'd train step over the device mesh, periodic
zero-shot evaluation, checkpointing.

Replaces reference CTCLIPTrainer.py:190-476.  Differences by design:
  * The train step is ONE compiled XLA program: forward (both towers), global-
    batch InfoNCE (negatives gathered over the 'data' axis by XLA from the
    batch sharding), backward, grad-clip 0.5, AdamW update, VQ EMA codebook
    update.  No autocast context — precision is the bf16 policy.
  * The data-sharding bug of the reference (accelerator.prepare on an iterator,
    CTCLIPTrainer.py:260-275, so every rank saw the same stream) is structurally
    impossible: the global batch is placed with a NamedSharding over 'data'.
  * Zero-shot eval encodes each volume once and scores all prompt pairs from
    cached prompt latents (vs 36 re-encodes per volume, SURVEY.md §3.2).
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import optax

from ctpa.core.checkpoint import CheckpointManager
from ctpa.core.config import OptimizerConfig, TrainConfig
from ctpa.core.mesh import batch_sharding, is_primary, replicated
from ctpa.core.precision import Policy
from ctpa.models.ctclip import CTCLIP
from ctpa.ops.vq import ema_update
from ctpa.train.metrics import MetricsTracker
from ctpa.train.optim import get_optimizer
from ctpa.train.train_state import CLIPTrainState


def make_clip_train_step(
    model: CTCLIP,
    tx: optax.GradientTransformation,
    vq_decay: float = 0.99,
    commit_weight: float = 0.0,
    policy: Optional[Policy] = None,
    use_mlm: bool = False,
    use_visual_ssl: bool = False,
    mask_token_id: int = 103,
    seed: int = 0,
):
    """Build the jitted (state, batch) -> (state, metrics) step.

    batch: {"input_ids": (B, L), "attention_mask": (B, L), "video": (B, c, T, H, W)}
    Under a mesh, donate the state and shard the batch on 'data'; XLA inserts
    the latent all-gather for the global similarity matrix.

    SSL weighting parity (ct_clip.py:890-899): when enabled, the total loss is
    contrastive + text_ssl_weight * MLM + image_ssl_weight * SimCLR, with the
    weights from CTCLIPConfig.  Step-derived rng keeps the masking/augs
    deterministic and jit-pure.
    """
    policy = policy or Policy()
    base_key = jax.random.key(seed)

    def loss_fn(params, vq_state, batch, step):
        out = model.apply(
            params,
            batch["input_ids"],
            batch["attention_mask"],
            policy.cast_to_compute(batch["video"]),
            vq_state,
            return_loss=True,
        )
        loss = out.loss
        if out.vq_commit_loss is not None and commit_weight > 0:
            loss = loss + commit_weight * out.vq_commit_loss
        metrics_extra = {}
        if use_mlm:
            from ctpa.models.mlm import mlm_loss as _mlm

            key = jax.random.fold_in(base_key, step * 2 + 1)
            tl = _mlm(
                key,
                lambda ids, am: model.apply(params, ids, am, method=CTCLIP.mlm_logits),
                batch["input_ids"], batch["attention_mask"],
                mask_token_id=mask_token_id,
            )
            loss = loss + model.cfg.text_ssl_loss_weight * tl
            metrics_extra["mlm_loss"] = tl
        if use_visual_ssl:
            from ctpa.models.visual_ssl import simclr_ssl_loss

            key = jax.random.fold_in(base_key, step * 2 + 2)
            vl = simclr_ssl_loss(
                key,
                lambda v: model.apply(params, v, method=CTCLIP.visual_ssl_embed),
                policy.cast_to_compute(batch["video"]),
            )
            loss = loss + model.cfg.image_ssl_loss_weight * vl
            metrics_extra["visual_ssl_loss"] = vl
        return loss, (out, metrics_extra)

    def train_step(state: CLIPTrainState, batch):
        (loss, (out, metrics_extra)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.vq_state, batch, state.step
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        vq_state = state.vq_state
        if vq_state is not None and out.vq_counts is not None:
            # batch is global under pjit -> counts/sums are already global
            vq_state = ema_update(vq_state, out.vq_counts, out.vq_sums, decay=vq_decay)
        gnorm = optax.global_norm(grads)
        metrics = {
            "loss": loss,
            "grad_norm": gnorm,
            "temperature": jnp.exp(state.params["params"]["temperature"]),
            **metrics_extra,
        }
        if out.vq_commit_loss is not None:
            metrics["vq_commit"] = out.vq_commit_loss
        return (
            CLIPTrainState(params=params, opt_state=opt_state,
                           vq_state=vq_state, step=state.step + 1),
            metrics,
        )

    return train_step


def clip_finetune_mask(params: Any,
                       unfreeze: tuple[str, ...] = ("visual_transformer",
                                                    "text_transformer")) -> Any:
    """Reference fine-tune selection (fine_tuning_ctclip.py:5-15): freeze all
    CTCLIP params, then unfreeze the listed top-level modules (default: both
    towers — latent projections and temperature stay frozen, exactly as the
    reference script leaves them requires_grad=False)."""

    def label(path, _):
        names = {str(getattr(p, "key", getattr(p, "name", ""))) for p in path}
        return bool(names & set(unfreeze))

    return jax.tree_util.tree_map_with_path(label, params)


class CTClipTrainer:
    """Driver loop: data iterator -> pjit step -> periodic eval/checkpoint.

    `train_loader` yields host batches (dict of numpy arrays with a global
    leading batch dim).  `eval_fn(state, step)` is the zero-shot evaluation
    hook (see ctpa/eval/zeroshot.py + cli/zeroshot_infer.py); it runs on
    process 0 every `save_results_every` steps (CTCLIPTrainer.py:356-453
    semantics without the rank-gated artifact races).
    """

    def __init__(
        self,
        model: CTCLIP,
        state: CLIPTrainState,
        train_loader: Iterator,
        cfg: TrainConfig = TrainConfig(),
        opt_cfg: OptimizerConfig = OptimizerConfig(),
        mesh=None,
        eval_fn: Optional[Callable[[CLIPTrainState, int], dict]] = None,
        commit_weight: float = 0.0,
        trainable_mask: Optional[Any] = None,
    ):
        """`trainable_mask`: optional bool pytree (or callable params -> bool
        pytree) selecting which params receive updates; False leaves are
        frozen via optax.set_to_zero.  The reference's fine-tune script
        freezes everything then unfreezes both towers
        (fine_tuning_ctclip.py:5-15) — `clip_finetune_mask` reproduces that
        selection."""
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.train_loader = train_loader
        self.eval_fn = eval_fn
        self.tx = get_optimizer(opt_cfg, state.params)
        if trainable_mask is not None:
            mask = (trainable_mask(state.params) if callable(trainable_mask)
                    else trainable_mask)
            self.tx = optax.multi_transform(
                {True: self.tx, False: optax.set_to_zero()}, mask)
            # the caller's state was created with the unmasked tx; rebuild
            # opt_state so the multi_transform wrapper owns it
            state = CLIPTrainState(
                params=state.params, opt_state=self.tx.init(state.params),
                vq_state=state.vq_state, step=state.step)
        step_fn = make_clip_train_step(
            model, self.tx, commit_weight=commit_weight,
            policy=Policy() if cfg.precision == "bf16" else Policy(compute_dtype=jnp.float32),
        )
        if mesh is not None:
            state_sh = jax.tree.map(lambda _: replicated(mesh), state)
            batch_sh = batch_sharding(mesh)
            self._step = jax.jit(
                step_fn,
                in_shardings=(state_sh, batch_sh),
                out_shardings=(state_sh, replicated(mesh)),
                donate_argnums=(0,),
            )
            self._batch_sharding = batch_sh
        else:
            self._step = jax.jit(step_fn, donate_argnums=(0,))
            self._batch_sharding = None
        self.state = state
        self.ckpt = CheckpointManager(cfg.checkpoint_dir)
        self.metrics = MetricsTracker(os.path.join(cfg.results_dir, "train_metrics.json"))

    def _place(self, batch):
        if self._batch_sharding is None:
            return jax.tree.map(jnp.asarray, batch)
        return jax.tree.map(lambda x: jax.device_put(x, self._batch_sharding), batch)

    def train_step(self) -> dict:
        batch = self._place(next(self.train_loader))
        self.state, metrics = self._step(self.state, batch)
        return metrics

    def train(self, num_steps: Optional[int] = None) -> dict:
        num_steps = num_steps or self.cfg.num_train_steps
        last = {}
        t0 = time.time()
        while int(self.state.step) < num_steps:
            metrics = self.train_step()
            step = int(self.state.step)
            host = {k: float(v) for k, v in jax.device_get(metrics).items()}
            host["steps_per_sec"] = 1.0 / max(time.time() - t0, 1e-9)
            t0 = time.time()
            self.metrics.log(step, host)
            last = host
            if self.eval_fn is not None and step % self.cfg.save_results_every == 0:
                if is_primary():
                    eval_metrics = self.eval_fn(self.state, step)
                    self.metrics.log(step, {f"eval/{k}": v for k, v in eval_metrics.items()})
            if step % self.cfg.save_model_every == 0:
                self.save(step)
        # always leave a final checkpoint (short runs never hit the periodic
        # save interval otherwise)
        final_step = int(self.state.step)
        if final_step not in (self.ckpt.all_steps() or []):
            self.save(final_step)
        self.metrics.flush()
        return last

    def save(self, step: int):
        self.ckpt.save(step, jax.device_get(self.state))

    def close(self):
        """Drain async checkpoint writes before interpreter exit."""
        self.metrics.flush()
        self.ckpt.wait()
        self.ckpt.close()

    def load(self, step: Optional[int] = None):
        restored = self.ckpt.restore(step, target=jax.device_get(self.state))
        if restored is not None:
            self.state = jax.tree.map(jnp.asarray, restored)
        return self.state
