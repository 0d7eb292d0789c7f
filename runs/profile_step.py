"""Capture a profiler trace of the scanned pretrain step on the chip."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.batching import pack_graphs, pack_subgraphs
from scgib_tpu.graph.egonet import extract_egonets
from scgib_tpu.models.scgib import PretrainModel
from scgib_tpu.train.trainer import TrainState, adam_l2, make_pretrain_scan_step

INNER = 32
graphs = random_dataset(128, seed=0, min_nodes=10, max_nodes=30, feat_dim=9)
egos = [extract_egonets(g, 1) for g in graphs]
from scgib_tpu.data.loader import GraphDataset, plan_capacities
caps = plan_capacities(GraphDataset(list(graphs), k=1, egonets=egos), 128)
print("caps:", caps, file=sys.stderr)
g = pack_graphs(graphs, caps.nodes, caps.edges, 128, banded="device")
sub = pack_subgraphs(graphs, egos, caps.sub_nodes, caps.sub_edges,
                     banded="device")
g = jax.device_put(g); sub = jax.device_put(sub)
model = PretrainModel(in_dim=9, hidden=64, d_transfer=32,
                      recons_impl="gram", subgraph_mode="coo", encoder=os.environ.get("ENC","GIN"))
variables = jax.jit(model.init, static_argnames=("train",))(
    {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, g, sub, train=True)
tx = adam_l2(1e-4, weight_decay=5e-5)
state = TrainState.create(jax.tree_util.tree_map(jnp.copy, variables), tx)
step = make_pretrain_scan_step(model, tx, INNER, donate=False)
rng = jax.random.PRNGKey(2)
rng, k = jax.random.split(rng)
state, losses = step(state, g, sub, k)
float(np.asarray(losses.total)[-1])
print("compiled", file=sys.stderr)
outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scgib_trace"
with jax.profiler.trace(outdir):
    rng, k = jax.random.split(rng)
    state, losses = step(state, g, sub, k)
    float(np.asarray(losses.total)[-1])
print("trace done ->", outdir)
