"""Full pretrain step timing per encoder family (v5e-1).

Set BENCH_ENC_JSON=<path> to also write the results as a
BENCH_ENCODERS_r0N.json-style artifact."""
import json as _json
import os, sys, time, statistics
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.batching import pack_graphs, pack_subgraphs
from scgib_tpu.graph.egonet import extract_egonets
from scgib_tpu.models.scgib import PretrainModel
from scgib_tpu.train.trainer import TrainState, adam_l2, make_pretrain_scan_step

INNER = int(os.environ.get("INNER", "64"))
ENCODERS = sys.argv[1:] or ["Transformer"]
_results = {}
graphs = random_dataset(128, seed=0, min_nodes=10, max_nodes=30, feat_dim=9)
egos = [extract_egonets(g, 1) for g in graphs]
# BENCH_ENC_CAPS=fixed reproduces rounds 1-4's hardcoded worst-case caps
# (4096/16384/16384/65536); default 'planned' uses the production
# sqrt-sigma capacity planner (data/loader.py) — what the real training
# loop packs to since round 5.
if os.environ.get("BENCH_ENC_CAPS", "planned") == "fixed":
    CAPS = (4096, 16384, 16384, 65536)
else:
    from scgib_tpu.data.loader import GraphDataset, plan_capacities
    _c = plan_capacities(GraphDataset(list(graphs), k=1, egonets=egos), 128)
    CAPS = (_c.nodes, _c.edges, _c.sub_nodes, _c.sub_edges)
print(f"caps: {CAPS}", flush=True)
g = pack_graphs(graphs, CAPS[0], CAPS[1], 128, banded="device")
sub = pack_subgraphs(graphs, egos, CAPS[2], CAPS[3], banded="device")
edges = int(np.asarray(g.edge_mask).sum() + np.asarray(sub.edge_mask).sum())
g = jax.device_put(g); sub = jax.device_put(sub)

f = jax.jit(lambda x: x + 1.0); x0 = jnp.float32(0.)
for _ in range(3): float(f(x0))
ts = []
for i in range(10):
    t0=time.perf_counter(); float(f(x0)); ts.append(time.perf_counter()-t0)
rtt = min(ts)
print(f"rtt {rtt*1e3:.1f} ms", flush=True)

for enc in ENCODERS:
    model = PretrainModel(in_dim=9, hidden=64, d_transfer=32, encoder=enc)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, g, sub, train=True)
    tx = adam_l2(1e-4, weight_decay=5e-5)
    state = TrainState.create(jax.tree_util.tree_map(jnp.copy, variables), tx)
    step = make_pretrain_scan_step(model, tx, INNER, donate=False)
    rng = jax.random.PRNGKey(2)
    rng, kk = jax.random.split(rng)
    t0 = time.perf_counter()
    try:
        state, losses = step(state, g, sub, kk)
        l0 = float(np.asarray(losses.total)[-1])
    except Exception as e:
        print(f"{enc}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        continue
    ct = time.perf_counter()-t0
    walls = []
    for _ in range(3):
        rng, kk = jax.random.split(rng)
        t0 = time.perf_counter()
        state, losses = step(state, g, sub, kk)
        float(np.asarray(losses.total)[-1])
        walls.append(time.perf_counter() - t0)
    wall = statistics.median(walls)
    us = (wall - rtt) / INNER * 1e6
    print(f"{enc}: {us:.0f} us/step ({edges/us*1e6/1e6:.2f}e6 edges/s, "
          f"compile {ct:.0f}s, loss {l0:.3f})", flush=True)
    _results[enc] = {"us_per_step": round(us),
                     "edges_per_s": round(edges / us * 1e6),
                     "vs_baseline": round(edges / us * 1e6 / 2e6, 2)}

if os.environ.get("BENCH_ENC_JSON"):
    out = {
        "device": "TPU v5e-1 (axon tunnel)",
        "shape": ("batch 128 PCQM4Mv2-like molecules, k=1 ego-nets, "
                  f"caps {'/'.join(map(str, CAPS))} "
                  f"({os.environ.get('BENCH_ENC_CAPS', 'planned')} — "
                  "production sqrt-sigma planner unless 'fixed'), full "
                  f"pretrain step (fwd+bwd+Adam), INNER={INNER} scan, "
                  "RTT floor subtracted"),
        "baseline_edges_per_s": 2000000.0,
        "encoders": _results,
    }
    with open(os.environ["BENCH_ENC_JSON"], "w") as f:
        _json.dump(out, f, indent=2)
    print("wrote", os.environ["BENCH_ENC_JSON"], flush=True)
