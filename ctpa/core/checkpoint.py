"""Checkpoint / resume — orbax-backed pytree checkpointing.

Replaces the reference's `torch.save` dict checkpoints (CTCLIPTrainer.py:289-307,
train_module.py:159-214) with a step-indexed orbax store of
{params, opt_state, vq_state, step} plus JSON metadata.  Writes are gated on
process 0 (the reference used `accelerator.is_main_process`); restore is
sharding-aware when a target template is given.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import orbax.checkpoint as ocp

from ctpa.core.mesh import is_primary


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, metadata: Optional[dict] = None, force: bool = False):
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                **(
                    {"metadata": ocp.args.JsonSave(metadata)}
                    if metadata is not None else {}
                ),
            ),
            force=force,
        )

    def restore(self, step: Optional[int] = None, target: Any = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        restore_args = (
            ocp.args.Composite(state=ocp.args.StandardRestore(target))
            if target is not None
            else ocp.args.Composite(state=ocp.args.StandardRestore())
        )
        out = self._mgr.restore(step, args=restore_args)
        return out["state"]

    def restore_metadata(self, step: Optional[int] = None) -> Optional[dict]:
        """The JSON metadata saved alongside a step, or None if absent."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        try:
            out = self._mgr.restore(
                step, args=ocp.args.Composite(metadata=ocp.args.JsonRestore()))
            return out["metadata"]
        except (KeyError, FileNotFoundError, ValueError):
            return None

    def latest_step(self) -> Optional[int]:
        """Step-indexed equivalent of the reference's mtime-based
        `find_latest_checkpoint` (vqa_inference.py:24-46)."""
        return self._mgr.latest_step()

    def all_steps(self):
        return self._mgr.all_steps()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_json(path: str, obj: dict):
    if is_primary():
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            json.dump(obj, f, indent=2, default=str)
