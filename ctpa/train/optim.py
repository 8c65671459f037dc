"""Optimizer and LR-schedule factories (optax).

Parity targets:
  * `get_optimizer` — Adam when wd==0, else AdamW with weight decay applied
    only to params of ndim >= 2 (reference optimizer.py:3-34).
  * cosine-annealing-with-warmup-restarts schedule (CTCLIPTrainer.py:132-187):
    linear warmup to eta_max over T_warmup steps, then cosine cycles of length
    T_0 (optionally growing by T_mult) decaying by gamma per restart.
  * one-cycle schedule (train_module.py:375-383 uses OneCycleLR with cosine
    annealing and pct_start warmup).

Everything here is a pure optax transform chain — schedules are functions of
the step counter, so the whole update rule compiles into the pjit'd train step.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ctpa.core.config import OptimizerConfig


def weight_decay_mask(params) -> Any:
    """True (decay) for params with ndim >= 2 (reference optimizer.py:3-8)."""
    return jax.tree.map(lambda p: jnp.ndim(p) >= 2, params)


def cosine_warmup_restarts(
    eta_max: float,
    T_0: int,
    T_mult: int = 1,
    T_warmup: int = 10000,
    gamma: float = 1.0,
) -> optax.Schedule:
    """Warmup then cosine restart cycles (CTCLIPTrainer.py:154-168 semantics)."""

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = eta_max * count / max(T_warmup, 1)

        t = count - T_warmup
        if T_mult == 1:
            cycle = jnp.floor(t / T_0)
            t_cur = t - cycle * T_0
            t_i = jnp.asarray(T_0, jnp.float32)
        else:
            # cycle k starts at T_0 * (T_mult^k - 1) / (T_mult - 1)
            k = jnp.floor(
                jnp.log1p(t * (T_mult - 1) / T_0) / math.log(T_mult)
            )
            start = T_0 * (jnp.power(float(T_mult), k) - 1.0) / (T_mult - 1)
            t_cur = t - start
            t_i = T_0 * jnp.power(float(T_mult), k)
            cycle = k
        amp = eta_max * jnp.power(gamma, cycle)
        cos = amp * 0.5 * (1.0 + jnp.cos(jnp.pi * t_cur / t_i))
        return jnp.where(count < T_warmup, warm, cos)

    return schedule


def onecycle(
    peak_lr: float,
    total_steps: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> optax.Schedule:
    """OneCycleLR cosine variant (torch semantics used at train_module.py:375-383)."""
    init_lr = peak_lr / div_factor
    final_lr = init_lr / final_div_factor
    warm_steps = max(int(total_steps * pct_start), 1)

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        up = init_lr + (peak_lr - init_lr) * 0.5 * (
            1.0 - jnp.cos(jnp.pi * jnp.minimum(count / warm_steps, 1.0))
        )
        down_t = jnp.clip((count - warm_steps) / max(total_steps - warm_steps, 1), 0.0, 1.0)
        down = final_lr + (peak_lr - final_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * down_t))
        return jnp.where(count < warm_steps, up, down)

    return schedule


def build_schedule(cfg: OptimizerConfig) -> optax.Schedule | float:
    if cfg.schedule == "constant":
        return cfg.lr
    if cfg.schedule == "cosine_warmup_restarts":
        return cosine_warmup_restarts(
            eta_max=cfg.lr, T_0=max(cfg.total_steps - cfg.warmup_steps, 1),
            T_warmup=cfg.warmup_steps,
        )
    if cfg.schedule == "onecycle":
        return onecycle(peak_lr=cfg.lr, total_steps=cfg.total_steps)
    if cfg.schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.lr, cfg.warmup_steps, cfg.total_steps,
            end_value=cfg.lr * cfg.min_lr_ratio,
        )
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


def get_optimizer(cfg: OptimizerConfig, params=None) -> optax.GradientTransformation:
    """Factory with the reference's wd-grouping rule.  Pass `params` so the
    decay mask can be derived; if None the mask is computed lazily from the
    update-time params (optax masks accept callables)."""
    schedule = build_schedule(cfg)
    chain = []
    if cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.name == "adam" or cfg.weight_decay == 0:
        chain.append(optax.adam(schedule, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps))
    elif cfg.name == "adamw":
        chain.append(
            optax.adamw(
                schedule, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
                weight_decay=cfg.weight_decay,
                mask=weight_decay_mask if params is None else weight_decay_mask(params),
            )
        )
    else:
        raise ValueError(f"unknown optimizer {cfg.name!r}")
    return optax.chain(*chain)
