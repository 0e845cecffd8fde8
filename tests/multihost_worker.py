"""Worker for the multi-host CPU simulation test (see test_multihost.py).

Runs ONE training epoch over a global mesh spanning all processes and prints
a JSON line with the epoch loss, smooth rank and a parameter checksum. The
test launches 2 of these (4 virtual CPU devices each) and compares against a
single-process 8-device run — the multi-host program must be numerically
identical to the single-host one.
"""

import json
import os
import sys

pid = int(sys.argv[1])
n_proc = int(sys.argv[2])
port = sys.argv[3]
csv_path, feat_dir = sys.argv[4], sys.argv[5]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={8 // n_proc}")
os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["JAX_NUM_PROCESSES"] = str(n_proc)
os.environ["JAX_PROCESS_ID"] = str(pid)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from madeleine_tpu.parallel import multihost as mh

assert mh.initialize_from_env(verbose=False)

import numpy as np

from madeleine_tpu.config import MadeleineConfig
from madeleine_tpu.data.datasets import SlideDataset, TrainLoader
from madeleine_tpu.models.madeleine import init_madeleine_params
from madeleine_tpu.parallel.mesh import make_mesh
from madeleine_tpu.train.optim import make_optimizer
from madeleine_tpu.train.trainer import init_train_state, make_train_step, train_loop

MODALITIES = ["HE", "HER2", "PGR"]

cfg = MadeleineConfig(
    patch_embedding_dim=16, wsi_encoder_hidden_dim=16,
    attention_hidden_dim=16, n_heads=2, precision="float32",
    dataset="__test__", MODALITIES=list(MODALITIES),
    temperature=0.01, lr=1e-3, max_epochs=2, warmup=True, warmup_epochs=1,
    batch_size=8, got_subsample=8,
    global_loss="info-nce", local_loss="got", symmetric_cl=True,
).finalize()

ds = SlideDataset("T", csv_path, feat_dir, MODALITIES, embedding_size=16,
                  sample=24, per_case_seed=True, seed=5)
loader = TrainLoader(ds, batch_size=8, shuffle=True, seed=5,
                     process_index=jax.process_index(),
                     process_count=jax.process_count())

mesh = make_mesh(len(jax.devices()))
params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
tx, _ = make_optimizer(cfg, steps_per_epoch=len(loader))
state = init_train_state(params, tx)
step = make_train_step(cfg, tx, mesh=mesh, donate=False)

loader.set_epoch(0)
state, ep_loss, rank, agg = train_loop(cfg, step, state, loader, epoch=0,
                                       rng_key=jax.random.PRNGKey(3),
                                       mesh=mesh)
param_sum = float(sum(float(np.abs(np.asarray(p)).sum())
                      for p in jax.tree_util.tree_leaves(state.params)))
print("RESULT " + json.dumps({"pid": pid, "ep_loss": ep_loss, "rank": rank,
                              "param_sum": param_sum,
                              "n_steps": agg["n_steps"]}), flush=True)
