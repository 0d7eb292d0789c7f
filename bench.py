"""Benchmark: S-CGIB pretraining step throughput on the available device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: edges/s/chip through the full pretraining step (twin encoders over
graph batch + flattened ego-nets, compression, attention, 3 losses,
backward, Adam update) on a PCQM4Mv2-like synthetic batch (batch 128,
~10-30 heavy atoms per molecule — the reference's pretraining shape,
exp_pretraining.py:94, SURVEY.md §6).

Baseline: BASELINE.json's reference throughput if present, else the
DGL/PyTorch reference measured estimate (see BASELINE.md); vs_baseline is
ours/theirs (higher is better).
"""

import json
import os
import sys
import time

import numpy as np

# Run on whatever the driver gives us (TPU if available).
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.batching import (max_egonet_size, pack_graphs,
                                      pack_subgraphs, pack_subgraphs_dense)
from scgib_tpu.graph.egonet import extract_egonets
from scgib_tpu.models.scgib import PretrainModel
from scgib_tpu.train.trainer import (TrainState, adam_l2,
                                     make_pretrain_scan_step)

BATCH_GRAPHS = 128
NODE_CAP = 4096
EDGE_CAP = 16384
SUB_NODE_CAP = 16384
SUB_EDGE_CAP = 65536
FEAT = 9
INNER_STEPS = 50     # steps fused into one jitted lax.scan dispatch
OUTER_CALLS = 4      # timed dispatches (first warmup call not timed)

# Reference single-GPU (RTX A5000) DGL/PyTorch pretraining throughput
# estimate in edges/s; overridden by BASELINE.json "throughput_edges_per_s"
# if present.  The reference publishes no throughput numbers (SURVEY.md §6),
# so this is a conservative measured-class estimate recorded in BASELINE.md.
DEFAULT_BASELINE_EDGES_PER_S = 2.0e6


def main():
    graphs = random_dataset(BATCH_GRAPHS, seed=0, min_nodes=10, max_nodes=30,
                            feat_dim=FEAT)
    egos = [extract_egonets(g, 1) for g in graphs]
    # 'device' (default): COO upload + on-device block scatter;
    # 'host'/'1': host-built blocks (large upload, amortized here since the
    # bench reuses one device-resident batch); '0': COO segment path only
    banded = {"0": False, "host": True, "1": True}.get(
        os.environ.get("BENCH_BANDED", "device"), "device")
    g = pack_graphs(graphs, NODE_CAP, EDGE_CAP, BATCH_GRAPHS,
                    banded=banded)
    coo_sub = pack_subgraphs(graphs, egos, SUB_NODE_CAP, SUB_EDGE_CAP,
                             banded=banded)

    real_edges = int(np.asarray(g.edge_mask).sum())
    real_sub_edges = int(np.asarray(coo_sub.edge_mask).sum())
    # message-passing work per step: 4 GIN layers over both edge sets
    edges_per_step = real_edges + real_sub_edges

    # COO segment mode is the default: measured 3x faster than the dense
    # ego-net blocks on v5e (dense pays ~2.7x padding waste in the
    # conv MLP / BN rows); BENCH_SUBGRAPH_MODE=dense benches the other
    mode = os.environ.get("BENCH_SUBGRAPH_MODE", "coo")
    if mode == "dense":
        s_max = ((max_egonet_size(egos) + 7) // 8) * 8
        sub = pack_subgraphs_dense(graphs, egos, NODE_CAP, s_max)
    else:
        sub = coo_sub

    # device-resident batch: without this every dispatch re-uploads the
    # (numpy) batch — ~20 MB with band blocks — through the host link
    g = jax.device_put(g)
    sub = jax.device_put(sub)

    impl = os.environ.get("BENCH_RECONS_IMPL", "gram")
    model = PretrainModel(in_dim=FEAT, hidden=64, d_transfer=32,
                          recons_impl=impl, subgraph_mode=mode)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g, sub, train=True)
    tx = adam_l2(1e-4, weight_decay=5e-5)
    state = TrainState.create(variables, tx)
    step = make_pretrain_scan_step(model, tx, INNER_STEPS)

    rng = jax.random.PRNGKey(2)
    rng, k = jax.random.split(rng)
    state, losses = step(state, g, sub, k)        # compile + warmup
    jax.block_until_ready(losses.total)

    t0 = time.perf_counter()
    for _ in range(OUTER_CALLS):
        rng, k = jax.random.split(rng)
        state, losses = step(state, g, sub, k)
    jax.block_until_ready(losses.total)
    dt = time.perf_counter() - t0

    steps_per_s = OUTER_CALLS * INNER_STEPS / dt
    edges_per_s = edges_per_step * steps_per_s

    baseline = DEFAULT_BASELINE_EDGES_PER_S
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE.json")) as f:
            b = json.load(f)
        baseline = float(b.get("throughput_edges_per_s", baseline))
    except Exception:
        pass

    print(json.dumps({
        "metric": "pretrain_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s/chip",
        "vs_baseline": round(edges_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
