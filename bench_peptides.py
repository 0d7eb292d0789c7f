"""Peptides-shape stress bench — the LRGB configuration the banded layout
and sub-node capacities must survive (VERDICT round-1 item 6).

Molecular benches (bench.py) run k=1 ego-nets over 10-30-atom molecules;
the peptides datasets are ~150-node graphs with k up to 5
(exp_pep_func_5.py:369-381), which multiplies the flattened ego-net batch
by the k-hop neighborhood size.  This bench runs the FULL pretrain step
(twin encoders + compression + attention + 3 losses + Adam) at those
shapes, with and without remat (jax.checkpoint), and prints one
BENCH-style JSON line per configuration:

    {"k": ..., "remat": ..., "graphs": ..., "sub_nodes": ...,
     "edges_per_step": ..., "us_per_step": ..., "edges_per_s": ...}

Shapes that exceed device memory report {"oom": true} instead of dying.
"""

import json
import os
import statistics
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.batching import pack_graphs, pack_subgraphs
from scgib_tpu.graph.egonet import extract_egonets
from scgib_tpu.models.scgib import PretrainModel
from scgib_tpu.train.trainer import (TrainState, adam_l2,
                                     make_pretrain_scan_step)

BATCH = 32            # peptides fine-tune batch is 128/accum2; 32 graphs
                      # of ~150 nodes match the reference's node volume
MIN_N, MAX_N = 120, 160
FEAT = 9
INNER = 10
REPS = 3


def _round_up(x, m):
    return max(m, (x + m - 1) // m * m)


def run_config(graphs, k, remat):
    egos = [extract_egonets(g, k) for g in graphs]
    n_total = sum(g.num_nodes for g in graphs)
    e_total = sum(g.num_edges for g in graphs)
    s_total = sum(sum(len(nl) for nl in ego.node_lists) for ego in egos)
    q_total = sum(sum(len(el[0]) for el in ego.edge_lists)
                  for ego in egos)
    node_cap = _round_up(n_total, 256)
    edge_cap = _round_up(e_total, 512)
    sub_cap = _round_up(s_total, 256)
    sub_e_cap = _round_up(q_total, 512)

    g = pack_graphs(graphs, node_cap, edge_cap, BATCH)
    sub = pack_subgraphs(graphs, egos, sub_cap, sub_e_cap)
    edges_per_step = e_total + q_total

    model = PretrainModel(in_dim=FEAT, hidden=64, d_transfer=32)
    out = {"k": k, "remat": bool(remat), "graphs": BATCH,
           "nodes": n_total, "sub_nodes": s_total,
           "edges_per_step": edges_per_step}
    try:
        g = jax.device_put(g)
        sub = jax.device_put(sub)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "noise": jax.random.PRNGKey(1)}, g, sub, train=True)
        tx = adam_l2(1e-4, weight_decay=5e-5)
        state = TrainState.create(variables, tx)
        step = make_pretrain_scan_step(model, tx, INNER, remat=remat)
        rng = jax.random.PRNGKey(2)
        rng, kk = jax.random.split(rng)
        state, losses = step(state, g, sub, kk)
        float(np.asarray(losses.total)[-1])
        times = []
        for _ in range(REPS):
            rng, kk = jax.random.split(rng)
            t0 = time.perf_counter()
            state, losses = step(state, g, sub, kk)
            # scalar readback: block_until_ready on donated outputs
            # returns early through the axon tunnel (see bench.py)
            float(np.asarray(losses.total)[-1])
            times.append(time.perf_counter() - t0)
        sec = statistics.median(times) / INNER
        out["us_per_step"] = round(sec * 1e6, 1)
        out["edges_per_s"] = round(edges_per_step / sec, 1)
        out["loss_finite"] = bool(np.isfinite(float(losses.total[-1])))
    except Exception as e:  # XlaRuntimeError RESOURCE_EXHAUSTED etc.
        if "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e):
            out["oom"] = True
        else:
            out["error"] = str(e)[:200]
    print(json.dumps(out), flush=True)
    return out


def main():
    graphs = random_dataset(BATCH, seed=0, min_nodes=MIN_N,
                            max_nodes=MAX_N, feat_dim=FEAT)
    ks = [int(x) for x in os.environ.get("BENCH_PEPTIDES_KS",
                                         "1,3,5").split(",")]
    for k in ks:
        for remat in (False, True):
            run_config(graphs, k, remat)


if __name__ == "__main__":
    main()
