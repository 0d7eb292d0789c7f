"""Per-stage timeline of the REAL sustained loop (VERDICT r4 next 2).

Instruments bench.py's exact pipeline — batch_iterator(workers=4) ->
wire conversion/stack/serialize -> device_put (background thread) ->
superbatch scan step — with wall-clock stamps per superbatch at:

  produced  : wire bytes ready (producer thread, before device_put)
  put_done  : device_put returned (uploader thread)
  dispatched: step() returned (main thread, async dispatch)
  readback  : loss readback completed (end of run only)

Writes runs/sustained_trace.json with the stamps and derived gaps.
"""
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from scgib_tpu.data.loader import (GraphDataset, batch_iterator,
                                   plan_capacities, wire_compact_ok)
from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.wire import byte_spec_of, pack_bytes, to_wire_graph, \
    to_wire_sub
from scgib_tpu.models.scgib import PretrainModel
from scgib_tpu.train.trainer import (TrainState, adam_l2,
                                     make_pretrain_superbatch_step)

BATCH = 128
SUPER_K = 32
N_SUPER = int(os.environ.get("TRACE_SUPERS", "12"))

t_origin = time.perf_counter()


def now():
    return round((time.perf_counter() - t_origin) * 1e3, 1)


def main():
    warm = threading.Thread(
        target=lambda: float(jax.jit(lambda x: x + 1)(jnp.float32(0))),
        daemon=True)
    warm.start()

    pool = random_dataset(1024, seed=7, min_nodes=10, max_nodes=30,
                          feat_dim=9)
    ds = GraphDataset(pool, k=1)
    caps = plan_capacities(ds, BATCH)
    compact = wire_compact_ok(ds)

    model = PretrainModel(in_dim=9, hidden=64, d_transfer=32)
    warm.join()
    print("warm", now(), flush=True)

    g0, sub0 = next(batch_iterator(ds, BATCH, caps, shuffle=False))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jax.device_put(g0), jax.device_put(sub0), train=True)
    tx = adam_l2(1e-4, weight_decay=5e-5)
    state = TrainState.create(variables, tx)

    def batches_forever(seed0):
        s = seed0
        while True:
            yield from batch_iterator(ds, BATCH, caps, shuffle=True,
                                      seed=s, workers=4)
            s += 1

    stamps = []   # dict per superbatch

    def stacked_bytes(seed0, spec_holder):
        group = []
        idx = 0
        t_pack0 = time.perf_counter()
        for g, sub in batches_forever(seed0):
            group.append((to_wire_graph(g, compact=compact),
                          to_wire_sub(sub, compact=compact)))
            if len(group) < SUPER_K:
                continue
            edges = int(sum(int(w.n_edges) + int(v.n_edges)
                            for w, v in group))
            tree = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *group)
            if spec_holder[0] is None:
                spec_holder[0] = byte_spec_of(tree)
            buf = pack_bytes(tree, spec_holder[0])
            rec = {"i": idx, "produced": now(),
                   "pack_wall_ms": round(
                       (time.perf_counter() - t_pack0) * 1e3, 1)}
            stamps.append(rec)
            yield buf, edges, rec
            idx += 1
            group = []
            t_pack0 = time.perf_counter()

    spec_holder = [None]
    gen = stacked_bytes(1234, spec_holder)
    first = next(gen)
    spec = spec_holder[0]
    step = make_pretrain_superbatch_step(model, tx, byte_spec=spec,
                                         donate=False)
    print(f"wire {spec.total/1e6:.2f} MB/superbatch", flush=True)

    # compile
    rng = jax.random.PRNGKey(3)
    rng, k = jax.random.split(rng)
    state, losses = step(state, jax.device_put(first[0]), k)
    float(np.asarray(losses.total)[-1])
    print("compiled", now(), flush=True)

    # pipelined run with stamps: producer thread = gen (pack);
    # uploader thread = device_put; main = dispatch
    import queue
    q_put: "queue.Queue" = queue.Queue(maxsize=3)
    q_disp: "queue.Queue" = queue.Queue(maxsize=3)
    END = object()

    def producer():
        n = 0
        for buf, edges, rec in gen:
            q_put.put((buf, edges, rec))
            n += 1
            if n >= N_SUPER:
                break
        q_put.put(END)

    def uploader():
        while True:
            item = q_put.get()
            if item is END:
                q_disp.put(END)
                return
            buf, edges, rec = item
            t0 = time.perf_counter()
            dbuf = jax.device_put(buf)
            rec["put_return"] = now()
            rec["put_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
            q_disp.put((dbuf, edges, rec))

    threading.Thread(target=producer, daemon=True).start()
    threading.Thread(target=uploader, daemon=True).start()

    t_run0 = time.perf_counter()
    last = None
    nonlocal_state = state
    while True:
        item = q_disp.get()
        if item is END:
            break
        dbuf, edges, rec = item
        rec["got_main"] = now()
        rng, k = jax.random.split(rng)
        nonlocal_state, losses = step(nonlocal_state, dbuf, k)
        rec["dispatched"] = now()
        last = losses
    t_disp_done = time.perf_counter()
    float(np.asarray(last.total)[-1])
    t_read = time.perf_counter()
    total_ms = (t_read - t_run0) * 1e3

    out = {
        "wire_mb_per_super": round(spec.total / 1e6, 2),
        "n_super": N_SUPER,
        "total_ms": round(total_ms, 1),
        "ms_per_batch": round(total_ms / (N_SUPER * SUPER_K), 2),
        "dispatch_done_to_readback_ms": round(
            (t_read - t_disp_done) * 1e3, 1),
        "stamps": stamps[: N_SUPER + 2],
    }
    with open("/root/repo/runs/sustained_trace.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
