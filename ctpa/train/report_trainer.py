"""Report-generation / VQA fine-tuning trainer.

Parity with reference train_module.py:28-235, 274-406 and vqa_meditron.py:
280-397: AdamW with two LR groups (LLM/LoRA params at llm_lr, cross-attention
at cross_attn_lr — train_module.py:363-369), OneCycle cosine schedule with
warmup (:375-383), shifted-label CE with pad masking (:87-101), grad-clip 1.0
(:107), best-by-loss and best-by-val-score checkpoints (:153-214), JSON
metrics.  The frozen/trainable split (frozen CTViT trunk + base LLM weights,
trainable LoRA + cross-attn + vision proj) is an optax mask, not requires_grad
mutation — one pytree, uniform checkpointing.

NOTE (capability fix, SURVEY.md §2.2): the reference's meditron path extracts
vision features but never feeds them to the LLM (vqa_meditron.py:343-348);
here the cross-attention conditioning is always in the loss path.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ctpa.core.checkpoint import CheckpointManager
from ctpa.core.config import ReportGenConfig, TrainConfig
from ctpa.core.mesh import batch_sharding, is_primary, replicated
from ctpa.models.report_generator import CTReportGenerator
from ctpa.train.metrics import MetricsTracker
from ctpa.train.optim import onecycle
from ctpa.train.train_state import SimpleTrainState


def _path_has(path, *names) -> bool:
    keys = jax.tree_util.keystr(path)
    return any(n in keys for n in names)


def make_report_optimizer(
    params: Any,
    gen_cfg: ReportGenConfig,
    total_steps: int,
    grad_clip: float = 1.0,
    train_full_llm: bool = False,
) -> optax.GradientTransformation:
    """Two-LR-group AdamW over the trainable subset:
      * 'head' group (cross_attention, vision proj): cross_attn_lr
      * 'llm' group (LoRA params, or all LLM params if train_full_llm): llm_lr
      * 'frozen': zero updates
    """

    labels = trainable_labels(params, train_full_llm)
    groups = {**_opt_groups(gen_cfg, total_steps), "frozen": optax.set_to_zero()}
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.multi_transform(groups, labels),
    )


def _opt_groups(gen_cfg: ReportGenConfig, total_steps: int) -> dict:
    """The two-LR AdamW groups (train_module.py:363-369) — single source for
    both the full-tree-masked and the partitioned optimizer variants."""
    return {
        "head": optax.adamw(onecycle(gen_cfg.cross_attn_lr, total_steps),
                            weight_decay=1e-2),
        "llm": optax.adamw(onecycle(gen_cfg.llm_lr, total_steps),
                           weight_decay=1e-2),
    }


def make_report_train_step(model: CTReportGenerator, tx: optax.GradientTransformation):
    def step(state: SimpleTrainState, batch):
        def loss_fn(p):
            return model.apply(
                p, batch["video"], batch["input_ids"], batch["attention_mask"],
                batch.get("label_mask"), method=CTReportGenerator.loss,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return SimpleTrainState(params=params, opt_state=opt_state,
                                step=state.step + 1), metrics

    return step


def trainable_labels(params: Any, train_full_llm: bool = False) -> Any:
    """The head/llm/frozen group tree used by both optimizer variants."""

    def label(path, _):
        if _path_has(path, "cross_attention", "vision_feature_extractor/proj",
                     "vision_feature_extractor/norm"):
            return "head"
        if _path_has(path, "lora_a", "lora_b"):
            return "llm"
        if train_full_llm and _path_has(path, "llm/"):
            return "llm"
        return "frozen"

    return jax.tree_util.tree_map_with_path(label, params)


def make_partitioned_report_step(
    model: CTReportGenerator,
    params: Any,
    gen_cfg: ReportGenConfig,
    total_steps: int,
    grad_clip: float = 1.0,
    train_full_llm: bool = False,
):
    """LoRA-scale fine-tuning step that differentiates ONLY the trainable
    leaves.  `make_report_train_step` takes gradients of the FULL tree (the
    optax mask merely zeroes the updates) — at Meditron-7B that materializes
    a 13.5 GB gradient tree next to the 13.5 GB weights and OOMs one v5e.
    Here the frozen leaves are closed over (no cotangents exist for them),
    so the gradient tree is the LoRA+head subset (~MBs at 7B) and a 7B LoRA
    fine-tune fits a single chip.

    Grad-clip semantics differ from `make_report_train_step`: here the global
    norm is computed over the TRAINABLE leaves only (the mathematically
    meaningful norm — frozen leaves receive no updates), whereas the masked
    variant clips over the full gradient tree before masking.  The same
    `grad_clip` value therefore yields different effective update magnitudes
    between the two variants; LR schedules / checkpoints tuned on one are not
    directly comparable to the other.

    Returns (step_fn, init_opt_state): `step_fn(state, batch)` with
    `state.opt_state` being the optimizer state over the trainable-leaf
    list (checkpoint it as-is)."""
    labels_tree = trainable_labels(params, train_full_llm)
    flat_params, treedef = jax.tree_util.tree_flatten(params)
    flat_labels = jax.tree_util.tree_leaves(labels_tree)
    t_idx = [i for i, l in enumerate(flat_labels) if l != "frozen"]
    if not t_idx:
        raise ValueError("no trainable parameters under the report labels")
    sub_labels = [flat_labels[i] for i in t_idx]

    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.multi_transform(_opt_groups(gen_cfg, total_steps), sub_labels),
    )

    def step(state: SimpleTrainState, batch):
        leaves = jax.tree_util.tree_leaves(state.params)
        trainable = [leaves[i] for i in t_idx]

        def loss_fn(t_leaves):
            merged = list(leaves)
            for j, i in enumerate(t_idx):
                merged[i] = t_leaves[j]
            p = jax.tree_util.tree_unflatten(treedef, merged)
            if "vision" in batch:
                # precomputed features (separate extract_vision program):
                # keeps the video tensor + frozen-trunk activations out of
                # the training step's HBM footprint
                return model.apply(
                    p, batch["vision"], batch["input_ids"],
                    batch["attention_mask"], batch.get("label_mask"),
                    method=CTReportGenerator.loss_from_vision,
                )
            return model.apply(
                p, batch["video"], batch["input_ids"], batch["attention_mask"],
                batch.get("label_mask"), method=CTReportGenerator.loss,
            )

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = tx.update(grads, state.opt_state, trainable)
        new_t = optax.apply_updates(trainable, updates)
        merged = list(leaves)
        for j, i in enumerate(t_idx):
            merged[i] = new_t[j]
        new_params = jax.tree_util.tree_unflatten(treedef, merged)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return SimpleTrainState(params=new_params, opt_state=opt_state,
                                step=state.step + 1), metrics

    init_opt_state = tx.init([flat_params[i] for i in t_idx])
    return step, init_opt_state


class ReportTrainer:
    """Epoch-driven fine-tune loop with best-by-loss / best-by-val checkpoints
    (train_module.py:153-214 semantics)."""

    def __init__(
        self,
        model: CTReportGenerator,
        state: SimpleTrainState,
        tx: optax.GradientTransformation,
        cfg: TrainConfig = TrainConfig(),
        mesh=None,
        eval_fn: Optional[Callable[[SimpleTrainState], dict]] = None,
        eval_frequency: int = 1,
        step_fn=None,
    ):
        self.model = model
        self.cfg = cfg
        self.eval_fn = eval_fn
        self.eval_frequency = eval_frequency
        # default: full-tree grads with optax masking (fine at small scale);
        # pass make_partitioned_report_step's fn for 7B LoRA fine-tunes
        step_fn = step_fn or make_report_train_step(model, tx)
        if mesh is not None:
            st_sh = jax.tree.map(lambda _: replicated(mesh), state)
            self._step = jax.jit(step_fn, in_shardings=(st_sh, batch_sharding(mesh)),
                                 out_shardings=(st_sh, replicated(mesh)),
                                 donate_argnums=(0,))
            self._sharding = batch_sharding(mesh)
        else:
            self._step = jax.jit(step_fn, donate_argnums=(0,))
            self._sharding = None
        self.state = state
        self.ckpt = CheckpointManager(cfg.checkpoint_dir)
        self.metrics = MetricsTracker(os.path.join(cfg.results_dir, "report_train_metrics.json"))
        self.best_loss = float("inf")
        self.best_val = -float("inf")

    def _place(self, batch):
        if self._sharding is None:
            return jax.tree.map(jnp.asarray, batch)
        return jax.tree.map(lambda x: jax.device_put(x, self._sharding), batch)

    def train_epoch(self, loader: Iterator, epoch: int) -> dict:
        losses = []
        for batch in loader:
            self.state, m = self._step(self.state, self._place(batch))
            losses.append(float(m["loss"]))
            self.metrics.log(int(self.state.step), {k: float(v) for k, v in m.items()})
        mean_loss = float(np.mean(losses)) if losses else float("nan")
        if mean_loss < self.best_loss and is_primary():
            self.best_loss = mean_loss
            self.ckpt.save(int(self.state.step), jax.device_get(self.state),
                           metadata={"kind": "best_loss", "epoch": epoch, "loss": mean_loss})
        if self.eval_fn is not None and (epoch + 1) % self.eval_frequency == 0:
            scores = self.eval_fn(self.state)
            self.metrics.log(int(self.state.step), {f"val/{k}": v for k, v in scores.items()})
            # composite (ROUGE-L + BERTScore-F1)/2 (train_module.py:189-214)
            val = scores.get("composite", np.mean(list(scores.values())) if scores else 0.0)
            if val > self.best_val and is_primary():
                self.best_val = val
                self.ckpt.save(int(self.state.step) + 1, jax.device_get(self.state),
                               metadata={"kind": "best_val", "epoch": epoch, "score": val})
        return {"epoch": epoch, "mean_loss": mean_loss}

    def close(self):
        """Drain async checkpoint writes (call before interpreter exit —
        orbax commits on a thread pool that dies with the process)."""
        self.metrics.flush()
        self.ckpt.wait()
        self.ckpt.close()
