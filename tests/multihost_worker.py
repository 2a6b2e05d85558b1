"""Inner worker for the 2-process multi-host test (test_multihost.py).

Each process: 4 virtual CPU devices -> 8-device global mesh over 2 hosts
(gloo collectives). Exercises the real multi-host pieces end to end:
``jax.distributed.initialize`` (the path main.py enables via
VQA_TPU_MULTIHOST), the per-process sharded Loader, global-batch assembly
via ``shard_batch`` (make_array_from_process_local_data), and one jitted
train step over the global mesh. Prints machine-checkable lines the parent
asserts on.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
root_dir = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)

import json
import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vqa_tpu.data.dataset import set_dataset
from vqa_tpu.data.loader import Loader
from vqa_tpu.models.wrapper import set_model
from vqa_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from vqa_tpu.training import optim as optim_lib
from vqa_tpu.training.state import create_train_state, make_train_step

with open(os.path.join(root_dir, "root.json")) as f:
    root = json.load(f)

assert jax.process_count() == 2 and jax.device_count() == 8

ds = set_dataset(load_path=root["annot"], feature_path=root["feature_root"],
                 ans_dim=root["ans_dim"], caption_id_path=root["select_path"],
                 is_train=True, dataset_type="vqa")
loader = Loader.for_process(ds, batch_size=8, shuffle=True, seed=3)

# 1) disjoint epoch cover: all sample ids seen by this host
seen = []
batches = []
for b in loader:
    nvalid = int(b.pop("nvalid"))
    seen.extend(b["id"][:nvalid].tolist())
    batches.append(b)
mine = np.asarray(sorted(set(seen)), np.int32)
pad = np.full(len(ds), -1, np.int32)
pad[: len(mine)] = mine
both = np.asarray(multihost_utils.process_allgather(jnp.asarray(pad)))
a, c = [set(int(x) for x in row if x >= 0) for row in both]
assert a | c == set(range(len(ds))), "epoch does not cover the dataset"
overlap = len(a & c)
print(f"SHARDS pid={pid} mine={len(mine)} overlap={overlap}")

# 2) one DP train step over the global mesh from per-host batches
model = set_model(encoder_type="base", predictor_type="base",
                  decoder_type="none", ntoken=root["ntoken"],
                  v_dim=root["v_dim"], embed_dim=8, hidden_dim=16,
                  decoder_hidden_dim=8, ans_dim=root["ans_dim"], c_len=8,
                  dropout=0.0)
mesh = make_mesh()  # all 8 global devices on 'data'
mb = {k: v for k, v in batches[0].items() if k in ("img", "q", "a")}
tx = optim_lib.make_optimizer(lr=2e-3)
with mesh:
    state = create_train_state(model, tx, mb, seed=0)
    state = state.replace(params=replicate(mesh, state.params),
                          opt_state=replicate(mesh, state.opt_state))
    step = make_train_step(model, tx)
    gb = shard_batch(mesh, mb)
    for _ in range(3):
        state, metrics = step(state, gb)
    loss = float(metrics["loss"])
p0 = float(np.asarray(
    multihost_utils.process_allgather(jnp.float32(loss)))[0])
assert abs(loss - p0) < 1e-6, (loss, p0)
print(f"LOSS pid={pid} {loss:.6f}")
print(f"OK pid={pid}")
