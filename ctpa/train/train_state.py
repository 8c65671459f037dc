"""Functional train-state pytrees threaded through pjit'd steps."""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ctpa.ops.vq import VQState


@flax.struct.dataclass
class CLIPTrainState:
    params: Any
    opt_state: Any
    vq_state: Optional[VQState]
    step: jax.Array                  # int32 scalar

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, vq_state=None):
        return cls(
            params=params,
            opt_state=tx.init(params),
            vq_state=vq_state,
            step=jnp.zeros((), jnp.int32),
        )


@flax.struct.dataclass
class SimpleTrainState:
    """Params + optimizer state for the report/VQA trainers."""

    params: Any
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation):
        return cls(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))
