"""Decompose the sustained epoch loop into pack / wire / upload / compute
(VERDICT round-2 item 8) -> JSON + stderr log.

Phases measured independently at bench shapes (128-graph batches,
SUPER_K=16 superbatches):
  pack_ms     — C++ threaded packing + wire conversion + stacking, host only
  bytes_mb    — wire bytes per superbatch
  upload_ms   — device_put of one superbatch buffer pair, blocked
  compute_ms  — superbatch step on RESIDENT buffers (RTT-subtracted)
  e2e_ms      — the full prefetch-overlapped production loop
All per superbatch (16 batches).
"""
import json, statistics, sys, threading, time

import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scgib_tpu.data.loader import (GraphDataset, plan_capacities,
                                   prefetch_to_device, superbatch_specs,
                                   wire_superbatches)
from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.data.loader import batch_iterator
from scgib_tpu.models.scgib import PretrainModel
from scgib_tpu.train.trainer import (TrainState, adam_l2, init_model,
                                     make_pretrain_superbatch_step)

T0 = time.perf_counter()
def log(m): print(f"+{time.perf_counter()-T0:.1f}s {m}", file=sys.stderr,
                  flush=True)

def warm():
    float(jax.jit(lambda x: x + 1.0)(jnp.float32(0.0)))

th = threading.Thread(target=warm, daemon=True); th.start()

K = 16
BS = 128
pool = random_dataset(4096, seed=7, min_nodes=10, max_nodes=30, feat_dim=9)
ds = GraphDataset(pool, k=1)
caps = plan_capacities(ds, BS)
specs = superbatch_specs(ds, BS, caps, K)
th.join(); log("warm")

# rtt
f = jax.jit(lambda x: x * 2.0)
for _ in range(2): float(f(jnp.float32(1.0)))
rtts = []
for _ in range(8):
    t0 = time.perf_counter(); float(f(jnp.float32(1.0)))
    rtts.append(time.perf_counter() - t0)
rtt = min(rtts); log(f"rtt {rtt*1e3:.1f}ms")

# --- pack phase (host only) ---------------------------------------------
packs = []
n_bytes = None
for rep in range(3):
    t0 = time.perf_counter()
    bufs = list(wire_superbatches(ds, BS, caps, K, seed=rep,
                                  byte_specs=specs))
    packs.append((time.perf_counter() - t0) / len(bufs))
    n_bytes = bufs[0][0].nbytes + bufs[0][1].nbytes
pack_ms = statistics.median(packs) * 1e3
log(f"pack {pack_ms:.1f} ms/superbatch, {n_bytes/1e6:.2f} MB wire")

# --- upload phase --------------------------------------------------------
gb, sb, _ = bufs[0]
jax.block_until_ready(jax.device_put((gb, sb)))   # path warm
ups = []
for _ in range(5):
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put((gb, sb)))
    ups.append(time.perf_counter() - t0)
upload_ms = (statistics.median(ups) - rtt) * 1e3
log(f"upload {upload_ms:.1f} ms/superbatch "
    f"({n_bytes/statistics.median(ups)/1e6:.0f} MB/s eff)")

# --- compute phase (resident buffers) -----------------------------------
model = PretrainModel(in_dim=9, hidden=64, d_transfer=32,
                      recons_impl="gram", subgraph_mode="coo")
g0, sub0 = next(batch_iterator(ds, BS, caps, shuffle=False))
variables = init_model(model, {"params": jax.random.PRNGKey(0),
                               "noise": jax.random.PRNGKey(1)},
                       g0, sub0, train=True)
tx = adam_l2(1e-4, weight_decay=5e-5)
state = TrainState.create(variables, tx)
step = make_pretrain_superbatch_step(model, tx, byte_specs=specs,
                                     donate=False)
dgb = jax.device_put(gb); dsb = jax.device_put(sb)
rng = jax.random.PRNGKey(3)
rng, k = jax.random.split(rng)
state, losses = step(state, dgb, dsb, k)
float(np.asarray(losses.total)[-1])
log("compute compiled")
cs = []
for _ in range(5):
    rng, k = jax.random.split(rng)
    t0 = time.perf_counter()
    state, losses = step(state, dgb, dsb, k)
    float(np.asarray(losses.total)[-1])
    cs.append(time.perf_counter() - t0)
compute_ms = (statistics.median(cs) - rtt) * 1e3
log(f"compute {compute_ms:.1f} ms/superbatch "
    f"({compute_ms/K*1e3:.0f} us/batch-step)")

# --- end-to-end production loop -----------------------------------------
def run_loop(n_super, seed):
    nonlocal_rng = [jax.random.PRNGKey(seed)]
    st = TrainState.create(variables, tx)
    done = 0
    t0 = time.perf_counter()
    losses = None
    def gen():
        s = seed
        while True:
            yield from wire_superbatches(ds, BS, caps, K, seed=s,
                                         byte_specs=specs)
            s += 1
    for gbuf, sbuf, n_edges in prefetch_to_device(gen(), size=2):
        nonlocal_rng[0], kk = jax.random.split(nonlocal_rng[0])
        st, losses = step(st, gbuf, sbuf, kk)
        done += 1
        if done >= n_super:
            break
    float(np.asarray(losses.total)[-1])
    return (time.perf_counter() - t0) / n_super

run_loop(2, seed=99)          # warm pipeline
e2e = [run_loop(6, seed=i) for i in range(3)]
e2e_ms = statistics.median(e2e) * 1e3
edges_per_super = float(np.asarray(bufs[0][2] if len(bufs[0]) > 2 else 0))
# recompute real edges properly from one group
edges_counts = [e for (_, _, e) in bufs]
edges_per_super = statistics.median(edges_counts)
log(f"e2e {e2e_ms:.1f} ms/superbatch -> "
    f"{edges_per_super/(e2e_ms/1e3):.3e} edges/s sustained")

out = {"super_k": K, "pack_ms": round(pack_ms, 2),
       "wire_mb": round(n_bytes / 1e6, 3),
       "upload_ms": round(upload_ms, 2),
       "compute_ms": round(compute_ms, 2),
       "e2e_ms": round(e2e_ms, 2),
       "rtt_ms": round(rtt * 1e3, 2),
       "sustained_edges_per_s": round(edges_per_super / (e2e_ms / 1e3), 1)}
with open("/root/repo/SUSTAINED_BREAKDOWN_r03.json", "w") as fj:
    json.dump(out, fj, indent=1)
print(json.dumps(out))
