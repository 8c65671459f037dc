"""Multi-process (multi-host analog) smoke test: two REAL processes join via
`core.mesh.initialize_distributed` (jax.distributed over localhost), build a
global mesh spanning both, run a psum-carrying jitted step over a
globally-sharded batch, and gate a checkpoint write on `is_primary`.

This exercises what the virtual 8-device mesh cannot: process-spanning
collectives, `jax.process_index()` gating, and multi-process global-array
construction — the TPU-native analog of the reference's Accelerate/DDP layer
(CTCLIPTrainer.py:213-217).  CPU backend, 2 virtual devices per process.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

from ctpa.core.mesh import (DATA_AXIS, create_mesh, initialize_distributed,
                            is_primary)
from ctpa.core.config import MeshConfig

port = sys.argv[1]
pid = int(sys.argv[2])
out_dir = sys.argv[3]

initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                       num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
assert jax.device_count() == 4 and len(jax.local_devices()) == 2

mesh = create_mesh(MeshConfig(data_parallel=4, model_parallel=1))

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

sh = NamedSharding(mesh, P(DATA_AXIS))
# global batch assembled from per-process local shards
local = np.full((2, 8), 1.0 + pid, np.float32)              # 2 rows/process
garr = jax.make_array_from_process_local_data(sh, local, (4, 8))

# library path: ProcessShard reads a disjoint slice, global_batch_from_local
# assembles the global array from each host's rows
from ctpa.core.mesh import global_batch_from_local
from ctpa.data.datasets import ProcessShard

full = list(range(8))
shard = ProcessShard(full)                 # uses jax.process_index/count
mine = [shard[i] for i in range(len(shard))]
assert mine == list(range(pid, 8, 2)), mine          # strided, disjoint
rows = np.asarray(mine[:2], np.float32)[:, None] * np.ones((1, 8), np.float32)
gb = global_batch_from_local(mesh, {"x": rows})
assert gb["x"].shape == (4, 8)
# global sum over both processes' disjoint rows: (0+2) + (1+3) = 6
total = jax.jit(lambda b: jnp.sum(b["x"][:, 0]) * jnp.ones(()))(gb)
np.testing.assert_allclose(float(total), 6.0)

@jax.jit
def step(x):
    # mean over the GLOBAL batch: crosses the process boundary
    return jnp.mean(x) * jnp.ones_like(x)

out = step(garr)
# global mean of rows [1,1,2,2] = 1.5 on every shard of every process
np.testing.assert_allclose(
    np.asarray(out.addressable_shards[0].data)[0, 0], 1.5, rtol=1e-6)

# rank-gated write (checkpoint-style): only process 0 writes
if is_primary():
    with open(os.path.join(out_dir, "primary_marker"), "w") as f:
        f.write(f"process {pid}")

# --- SHARDED checkpoint round-trip across processes (orbax) -----------------
# Save a train state whose arrays are sharded over the process-spanning mesh
# (every process holds only its addressable shards), restore into the SAME
# sharding, and verify training continues identically — the multi-host
# failure mode the single-process tests cannot catch.  CheckpointManager's
# orbax save/restore is collective: ALL processes call it (only array-shard
# writes are per-process; the manager coordinates via the barrier).
import optax
from ctpa.core.checkpoint import CheckpointManager

psh = NamedSharding(mesh, P(DATA_AXIS))        # shard params over data axis
rep = NamedSharding(mesh, P())
params = {"w": jax.device_put(np.arange(4 * 8, dtype=np.float32
                                        ).reshape(4, 8), psh),
          "b": jax.device_put(np.zeros((4,), np.float32), rep)}
tx = optax.adam(1e-2)
opt_state = jax.jit(tx.init, out_shardings=None)(params)

def loss_fn(p, x):
    return jnp.mean((x @ p["w"].T + p["b"]) ** 2)

@jax.jit
def train_step(p, o, x):
    l, g = jax.value_and_grad(loss_fn)(p, x)
    upd, o = tx.update(g, o, p)
    return optax.apply_updates(p, upd), o, l

x = jax.device_put(np.ones((4, 8), np.float32), sh)
params1, opt1, loss1 = train_step(params, opt_state, x)

ckpt_dir = os.path.join(out_dir, "mp_ckpt")       # shared fs, all processes
mgr = CheckpointManager(ckpt_dir)
mgr.save(1, {"params": params1, "opt_state": opt1})
mgr.wait()

# restore INTO the sharded template: every process gets its own shards back
template = jax.tree.map(
    lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding),
    {"params": params1, "opt_state": opt1})
restored = mgr.restore(1, target=template)
for path_l, (a, b) in zip(
        jax.tree_util.tree_leaves_with_path(restored),
        zip(jax.tree.leaves(restored), jax.tree.leaves({"params": params1,
                                                        "opt_state": opt1}))):
    assert a.sharding == b.sharding, (path_l[0], a.sharding, b.sharding)
    for sa, sb in zip(a.addressable_shards, b.addressable_shards):
        np.testing.assert_array_equal(np.asarray(sa.data), np.asarray(sb.data))

# training continues from the restored state with an identical loss
_, _, loss2a = train_step(params1, opt1, x)
_, _, loss2b = train_step(restored["params"], restored["opt_state"], x)
np.testing.assert_allclose(float(loss2a), float(loss2b), rtol=1e-7)
mgr.close()
print(f"CKPT_OK {pid} loss2={float(loss2b):.6f}", flush=True)

print(f"WORKER_OK {pid}", flush=True)
"""


def test_two_process_distributed_smoke(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
           "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": os.path.dirname(os.path.dirname(__file__))}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(i), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out
        assert f"CKPT_OK {i}" in out
    marker = tmp_path / "primary_marker"
    assert marker.exists() and marker.read_text() == "process 0"
    # both processes continued from the restored sharded state with the
    # SAME loss (the state is global; the loss is a global reduction)
    l0 = [ln for ln in outs[0].splitlines() if ln.startswith("CKPT_OK")][0]
    l1 = [ln for ln in outs[1].splitlines() if ln.startswith("CKPT_OK")][0]
    assert l0.split("loss2=")[1] == l1.split("loss2=")[1]
    assert (tmp_path / "mp_ckpt").is_dir()


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
