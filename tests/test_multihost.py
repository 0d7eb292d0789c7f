"""Multi-host layer test (VERDICT round-1 item 4).

Two REAL OS processes (each with 4 virtual CPU devices) initialize a JAX
process group via ``initialize_distributed``, assemble the global sharded
batch with ``global_batch_from_local``, and run the shard_map DP pretrain
step over the 8-device mesh spanning both processes.  The psum'd losses
must equal the single-process single-device computation over the union
batch — i.e. scaling across HOSTS is numerics-exact, not just across
local devices (parallel/multihost.py previously had zero test coverage).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
sys.path.insert(0, %(repo)r)
from scgib_tpu.parallel.multihost import (global_batch_from_local,
                                          global_data_mesh,
                                          initialize_distributed)
initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                       num_processes=2, process_id=pid)
assert jax.device_count() == 8 and jax.local_device_count() == 4

import jax.numpy as jnp
import numpy as np
from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.batching import pack_graphs, pack_subgraphs
from scgib_tpu.graph.egonet import extract_egonets
from scgib_tpu.models.scgib import PretrainModel
from scgib_tpu.parallel.dp import DATA_AXIS, make_dp_pretrain_step
from scgib_tpu.train.trainer import TrainState, adam_l2

def make_shard(i):
    graphs = random_dataset(2, seed=100 + i, min_nodes=5, max_nodes=9,
                            feat_dim=5)
    egos = [extract_egonets(g, 1) for g in graphs]
    g = pack_graphs(graphs, 32, 128, 2)
    sub = pack_subgraphs(graphs, egos, 128, 512)
    return g, sub

# this process's 4 shards (global shard ids pid*4 .. pid*4+3)
shards = [make_shard(pid * 4 + j) for j in range(4)]
local_g = jax.tree_util.tree_map(
    lambda *xs: np.stack([np.asarray(x) for x in xs]),
    *[s[0] for s in shards])
local_sub = jax.tree_util.tree_map(
    lambda *xs: np.stack([np.asarray(x) for x in xs]),
    *[s[1] for s in shards])

mesh = global_data_mesh()
g_glob = global_batch_from_local(mesh, local_g)
sub_glob = global_batch_from_local(mesh, local_sub)

model = PretrainModel(in_dim=5, hidden=16, d_transfer=8,
                      deterministic=True, axis_name=DATA_AXIS)
init_model = PretrainModel(in_dim=5, hidden=16, d_transfer=8,
                           deterministic=True)
g0, sub0 = shards[0]
variables = init_model.init(
    {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
    g0, sub0, train=True)
tx = adam_l2(1e-4, weight_decay=5e-5)
state = TrainState.create(variables, tx)
step = make_dp_pretrain_step(model, tx, mesh, donate=False)
rngs = global_batch_from_local(
    mesh, np.stack([np.asarray(jax.random.PRNGKey(3))] * 4))
state, losses = step(state, g_glob, sub_glob, rngs)
out = {"pid": pid,
       "kl": float(losses.kl),
       "contrastive": float(losses.contrastive),
       "recon": float(losses.reconstruction)}
print("MHRESULT " + json.dumps(out), flush=True)
""" % {"repo": REPO}


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_matches_single_device(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen([sys.executable, str(worker), str(pid), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MHRESULT "):
                r = json.loads(line[len("MHRESULT "):])
                results[r["pid"]] = r
    assert set(results) == {0, 1}, outs[0][-2000:]
    # both processes see the identical global (psum'd) losses
    for key in ("kl", "contrastive", "recon"):
        np.testing.assert_allclose(results[0][key], results[1][key],
                                   rtol=1e-6)

    # single-process single-device reference over the union of the same
    # 8 shards (shard data is deterministic in the global shard id)
    import jax

    from scgib_tpu.data.synthetic import random_dataset
    from scgib_tpu.graph.batching import pack_graphs, pack_subgraphs
    from scgib_tpu.graph.egonet import extract_egonets
    from scgib_tpu.models.scgib import PretrainModel
    from scgib_tpu.train.trainer import (TrainState, adam_l2,
                                         make_pretrain_step)

    graphs = [g for i in range(8)
              for g in random_dataset(2, seed=100 + i, min_nodes=5,
                                      max_nodes=9, feat_dim=5)]
    egos = [extract_egonets(g, 1) for g in graphs]
    union_g = pack_graphs(graphs, 8 * 32, 8 * 128, 16)
    union_sub = pack_subgraphs(graphs, egos, 8 * 128, 8 * 512)
    single = PretrainModel(in_dim=5, hidden=16, d_transfer=8,
                           deterministic=True)
    g0 = pack_graphs(graphs[:2], 32, 128, 2)
    sub0 = pack_subgraphs(graphs[:2], egos[:2], 128, 512)
    variables = single.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g0, sub0, train=True)
    tx = adam_l2(1e-4, weight_decay=5e-5)
    state = TrainState.create(variables, tx)
    step = make_pretrain_step(single, tx, donate=False)
    _, ref_losses = step(state, union_g, union_sub, jax.random.PRNGKey(3))

    np.testing.assert_allclose(results[0]["kl"], float(ref_losses.kl),
                               rtol=2e-5)
    np.testing.assert_allclose(results[0]["contrastive"],
                               float(ref_losses.contrastive), rtol=2e-5)
    np.testing.assert_allclose(results[0]["recon"],
                               float(ref_losses.reconstruction), rtol=2e-5)
