"""Benchmark: GraphTransformer encoder COO vs banded-MXU attention.

Companion to bench_spmm.py — times the C4 encoder's two message-passing
paths (per-edge SDDMM + segment softmax vs gt_banded_attention) at the
pretraining batch shape on the attached device.  See PERF.md.
"""
import os, sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.batching import pack_graphs
from scgib_tpu.models.encoders import GraphTransformer

graphs = random_dataset(128, seed=0, min_nodes=10, max_nodes=30)
g = pack_graphs(graphs, 4096, 16384, 128, banded="host")
g = jax.device_put(g)
x = jnp.asarray(np.random.default_rng(0).normal(size=(g.num_nodes, 9)),
                jnp.float32)

enc = GraphTransformer(hidden=64, num_layers=4, num_heads=8)
variables = enc.init(jax.random.PRNGKey(0), x, g.senders, g.receivers,
                     node_mask=g.node_mask, edge_mask=g.edge_mask,
                     train=False)
band = (g.band_blocks, g.band_col_off)

coo = jax.jit(lambda v, x: enc.apply(v, x, g.senders, g.receivers,
                                     node_mask=g.node_mask,
                                     edge_mask=g.edge_mask, train=False))
bnd = jax.jit(lambda v, x: enc.apply(v, x, g.senders, g.receivers,
                                     node_mask=g.node_mask,
                                     edge_mask=g.edge_mask, band=band,
                                     train=False))


def timeit(name, fn, reps=100):
    out = fn(variables, x); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(variables, x)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e6:.1f} us")
    return out

a = timeit("GT fwd COO   ", coo)
b = timeit("GT fwd banded", bnd)
print("max diff:", float(jnp.abs(a - b).max()))

# grad step timing
def make_loss(use_band):
    def loss(p, x):
        out = enc.apply({"params": p}, x, g.senders, g.receivers,
                        node_mask=g.node_mask, edge_mask=g.edge_mask,
                        band=band if use_band else None, train=False)
        return jnp.sum(out ** 2)
    return jax.jit(jax.grad(loss))

gc = make_loss(False)
gb = make_loss(True)


def timeg(name, fn, reps=50):
    out = fn(variables["params"], x); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(variables["params"], x)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e6:.1f} us")

timeg("GT grad COO   ", gc)
timeg("GT grad banded", gb)
