"""Worker for tests/test_multiprocess.py: real 2-process distributed bring-up.

This is the positive path of the multi-host stack with NO monkeypatching —
the exact env contract of `ealdm_tpu.serving.maybe_initialize_distributed`
(JAX_COORDINATOR / JAX_NUM_PROCESSES / JAX_PROCESS_ID), matching the
reference's process-per-GPU DDP bring-up (`/root/reference/main.py:577`):

* `jax.distributed.initialize` against a localhost coordinator, 4 virtual
  CPU devices per process -> an 8-device global dp mesh;
* per-process data sharding: each process materializes ONLY its own rows of
  the deterministic global batch (`jax.make_array_from_process_local_data`);
* two sharded train steps (compiler-emitted gradient psum rides the Gloo
  cross-process collectives);
* metric reduction via `training.stats` (`multihost_utils.process_allgather`);
* rank-0-only checkpointing (`report0` semantics).

Writes a JSON result file (argv[1]) the test compares across processes and
against a single-process run of the identical program.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ealdm_tpu.serving import maybe_initialize_distributed

assert maybe_initialize_distributed(), "env contract not set"

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

OUT = sys.argv[1]
CKPT_DIR = sys.argv[2]

assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4, jax.local_device_count()
assert jax.device_count() == 8, jax.device_count()
pid = jax.process_index()

from ealdm_tpu.models.ddpm import DDPM
from ealdm_tpu.parallel import MeshConfig, create_mesh
from ealdm_tpu.training import init_train_state, make_train_step
from ealdm_tpu.training.stats import Collector, report

mesh = create_mesh(MeshConfig(data=8, model=1))

model = DDPM(
    unet_config=dict(
        image_size=8, in_channels=3, model_channels=8, out_channels=3,
        num_res_blocks=1, attention_resolutions=[], channel_mult=[1],
        num_heads=1,
    ),
    timesteps=10,
)

# deterministic GLOBAL batch; this process materializes ONLY its local rows
# (true per-process data loading, not a replicated scatter).
gbatch = (np.random.RandomState(0)
          .randn(16, 8, 8, 3).astype(np.float32) * 0.1)
rows_per_proc = gbatch.shape[0] // jax.process_count()
local_rows = gbatch[pid * rows_per_proc:(pid + 1) * rows_per_proc]
data_sh = NamedSharding(mesh, P("data"))
batch = {"img": jax.make_array_from_process_local_data(data_sh, local_rows)}

# identical init on every process (same key, host-side example batch)
state, opt = init_train_state(
    model, jr.PRNGKey(0), {"img": jnp.zeros((16, 8, 8, 3))},
    learning_rate=1e-3,
)
from ealdm_tpu.parallel import shard_state

# jax's multi-process device_put asserts each leaf is identical across
# processes by allgathering THROUGH jax (which canonicalizes f64->f32) and
# comparing to the raw host value — a bare python float leaf (the EMA decay)
# fails that check on precision alone. Pre-canonicalize every leaf the way
# jax would (identical in-compute values, x64 is disabled anyway).
def _canon(x):
    x = np.asarray(x)
    if x.dtype == np.float64:
        x = x.astype(np.float32)
    elif x.dtype == np.int64:
        x = x.astype(np.int32)
    return x

state = jax.tree_util.tree_map(_canon, state)
state = shard_state(state, mesh)

step = make_train_step(model, opt, mesh=mesh, donate=False)
losses, grad_norms = [], []
for i in (1, 2):
    state, metrics = step(state, batch, jr.PRNGKey(i))
    losses.append(float(metrics["loss"]))
    grad_norms.append(float(metrics["grad_norm"]))
assert int(state.step) == 2

# cross-process metric reduction: each process reports its OWN rank; the
# synced mean can only be 0.5 if process_allgather really crossed processes.
report("mp/rank", float(pid))
report("mp/loss", losses[-1])
col = Collector(regex="mp/.*")  # constructor syncs (and zeroes the counters)
assert col.num("mp/rank") == 2, col.as_dict()

# rank-0-only side effects (reference rank_zero_only semantics): report0
# must accumulate on process 0 only.
from ealdm_tpu.training import stats as stats_mod
from ealdm_tpu.training.stats import report0

report0("mp/zero_only", 1.0)
assert ("mp/zero_only" in stats_mod._counters) == (pid == 0)

# multihost checkpointing: orbax's CheckpointManager is collective in a
# multi-process runtime (create/save/close are cross-process barriers), so
# ALL ranks enter it and orbax's primary-host logic writes one coherent
# checkpoint — the GSPMD equivalent of the reference's rank-0 ModelCheckpoint.
from ealdm_tpu.training.checkpoint import CheckpointManager

mgr = CheckpointManager(CKPT_DIR, monitor=None)
mgr.save(int(state.step), jax.device_get(state), metrics={"loss": losses[-1]})
mgr.close()

# barrier: rank 1 must not exit while rank 0 is still checkpointing, or the
# distributed runtime's shutdown barrier (atexit) times out and kills rank 0.
from jax.experimental import multihost_utils

multihost_utils.sync_global_devices("worker_done")

with open(OUT, "w") as f:
    json.dump({
        "pid": pid,
        "losses": losses,
        "grad_norms": grad_norms,
        "rank_mean": col.mean("mp/rank"),
        "rank_num": col.num("mp/rank"),
        "loss_mean": col.mean("mp/loss"),
    }, f)
print(f"proc {pid}: OK losses={losses}", flush=True)
