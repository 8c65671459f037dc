"""Device mesh construction and the framework's axis convention.

TPU-native replacement for the reference's Accelerate/DDP layer
(CTCLIPTrainer.py:213-217): instead of an NCCL process-group wrapper, the
"backend" is a `jax.sharding.Mesh` plus a sharding-rule convention; collectives
compile into the XLA program (SURVEY.md §5.8).

Axis convention:
  - ``data``  : data parallelism (batch sharding, gradient psum, contrastive
                all-gather of latents).
  - ``model`` : tensor parallelism (sharded projections / attention heads).
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ctpa.core.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Multi-host bring-up (SURVEY.md §5.8 TPU-native equivalent of the
    reference's Accelerate/NCCL process-group init).  On TPU pods the args are
    discovered from the environment; pass them explicitly elsewhere.  Safe to
    call when already initialized."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized / single-process
        if "already" not in str(e).lower():
            raise


def create_mesh(cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a 2D (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp != n:
        raise ValueError(f"mesh {dp}x{mp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch dim sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def global_batch_from_local(mesh: Mesh, local_batch):
    """Assemble a globally-sharded batch from THIS process's local rows.

    Multi-host data loading: each process reads only its own samples (e.g. a
    `ctpa.data.datasets.ProcessShard` slice) and contributes
    global_batch/process_count rows; the returned arrays are global jax.Arrays
    sharded over the 'data' axis with no cross-host data movement (each
    host's rows land on its own devices).  Single-process: equivalent to
    `shard_batch`."""
    sh = batch_sharding(mesh)
    nproc = jax.process_count()

    def make(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * nproc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sh, x, global_shape)

    return jax.tree.map(make, local_batch)


def is_primary() -> bool:
    """Rank-0 gating for checkpoint/eval writes (replaces
    accelerator.is_main_process, CTCLIPTrainer.py:312-314)."""
    return jax.process_index() == 0


@contextlib.contextmanager
def maybe_mesh(mesh: Optional[Mesh]):
    if mesh is None:
        yield
    else:
        with mesh:
            yield


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    dp = mesh.shape[DATA_AXIS]
    if global_batch % dp != 0:
        raise ValueError(f"global batch {global_batch} not divisible by data axis {dp}")
    return global_batch // dp
