"""Benchmark: S-CGIB pretraining throughput on the available device.

Prints ONE JSON line with BOTH throughput views plus an MFU estimate
(VERDICT round-1 item 2 — the honest-bench requirement):

  value / device_edges_per_s — edges/s/chip of the on-device step alone
      (lax.scan over one resident batch), the kernel-level ceiling.
  sustained_edges_per_s — edges/s/chip through the PRODUCTION epoch
      loop: fresh batches packed on host (threaded C++ packer), stacked
      into superbatches, shipped, and scanned as real optimizer steps
      (make_pretrain_superbatch_step).  Includes pack + upload + step.
  mfu — model-FLOP utilization: analytic matmul FLOPs of the training
      step (forward x3 for fwd+bwd, + optimizer) over real rows/edges,
      divided by device-step time x peak.  Peak defaults to TPU v5e
      bf16 197 TFLOP/s (override BENCH_PEAK_FLOPS); compute runs f32,
      so this understates utilization of the f32 pipe.

Timing method (VERDICT round-2 item 1 — measurement honesty):

  * The timed step is jitted WITHOUT donation and scans INNER_STEPS=128
    optimizer steps per dispatch, so one dispatch's device work
    (~100s of ms) dwarfs the tunneled link's 20-40 ms round trip.
    (Round 2's 23 us/step "measurement" was an async-dispatch artifact
    on donated-aliased outputs — physically impossible on this link.)
  * An RTT floor is measured with a trivial jitted scalar op and
    subtracted from each dispatch wall time before dividing by
    INNER_STEPS.
  * The JSON carries `rtt_ms` and `dispatch_wall_ms` so the number can
    be sanity-checked: dispatch_wall_ms must exceed rtt_ms by the real
    device time (dispatch_wall >= rtt is the plausibility invariant).

Runtime is bounded (BENCH_BUDGET_S, default 280 s from the post-warmup
mark): the sustained phase only runs inside the remaining budget and is
skipped (nulls in the JSON) if the budget is spent.  A provisional JSON
line with the device-path numbers prints BEFORE the sustained phase, so
even an outer kill mid-sustained leaves a parseable record; the final
line (last on stdout) carries the sustained fields.

Shape: batch 128 PCQM4Mv2-like molecules (10-30 heavy atoms), k=1
ego-nets, GIN-64, d_transfer 32 — the reference pretraining config
(exp_pretraining.py:94, SURVEY.md §6).
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

# Persistent compilation cache: compiles through the tunneled device vary
# 7-120 s each; caching them on disk makes reruns (and the driver's bench
# invocation) start hot.  Harmless on a local host.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scgib_tpu.data.loader import (GraphDataset, batch_iterator,
                                   plan_capacities, prefetch_to_device,
                                   wire_compact_ok)
from scgib_tpu.graph.wire import (byte_spec_of, pack_bytes,
                                  pack_bytes_grouped, to_wire_graph,
                                  to_wire_sub)
from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.batching import (max_egonet_size, pack_graphs,
                                      pack_subgraphs, pack_subgraphs_dense)
from scgib_tpu.graph.egonet import extract_egonets
from scgib_tpu.models.scgib import PretrainModel
from scgib_tpu.train.trainer import (TrainState, adam_l2,
                                     make_pretrain_scan_step,
                                     make_pretrain_superbatch_step)

_T0 = time.perf_counter()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "280"))
_BUDGET_FROM = [_T0]     # reset to post-warmup time (see _warm_device)


def _remaining():
    return BUDGET_S - (time.perf_counter() - _BUDGET_FROM[0])


def _warm_device():
    """Absorb the tunnel's one-time first-sync stall.

    Measured on the axon tunnel: the first device sync of every fresh
    process stalls 30-500 s (lazy session establishment); every later
    round trip is ~25 ms.  Running the first sync in a background thread
    overlaps the stall with host-side packing, and the budget clock only
    starts once the channel is warm — otherwise the stall would eat the
    whole budget before any measurement ran."""
    f = jax.jit(lambda x: x + 1.0)
    float(f(jnp.float32(0.0)))


def _vlog(msg):
    print(f"[bench +{time.perf_counter() - _T0:.1f}s] {msg}",
          file=sys.stderr, flush=True)


BATCH_GRAPHS = 128
# device-path capacities: planned from the pool statistics at runtime
# (plan_capacities sqrt-sigma sizing).  Rounds 1-4 hardcoded 4096/16384/
# 16384/65536 here, which made 53-82% of every buffer padding — shipped
# over the tunnel and swept by every kernel (round-5 trace).
FEAT = 9
HIDDEN = 64
DT = 32
INNER_STEPS = 128    # steps fused into one jitted lax.scan dispatch —
                     # large enough that device work per dispatch (~100s
                     # of ms) dominates the 20-40 ms tunnel RTT
DEVICE_REPS = 3      # timed dispatches for the device path (median)
SUPER_K = 32         # batches per superbatch dispatch (ONE combined
                     # uint8 upload each: more batches per transfer
                     # round trip on a high-latency link)
SUSTAINED_BATCHES = 192  # fresh batches per sustained reading (6
                     # superbatches: single-upload jitter on the tunnel
                     # skewed 3-superbatch readings by +-30%)
SUSTAINED_REPS = 5       # sustained readings (median), budget permitting
DATASET_GRAPHS = 1024    # pool the sustained loop draws from

# Reference single-GPU (RTX A5000) DGL/PyTorch pretraining throughput
# estimate in edges/s; overridden by BASELINE.json "throughput_edges_per_s"
# if present.  The reference publishes no throughput numbers (SURVEY.md §6).
DEFAULT_BASELINE_EDGES_PER_S = 2.0e6
# TPU v5e peak: 197 TFLOP/s bf16 (f32 compute -> conservative MFU)
DEFAULT_PEAK_FLOPS = 197e12


def flop_model(n_rows, s_rows, e_edges, q_edges, g_graphs, n_params,
               num_convs=4, feat=FEAT, dt=DT, d=HIDDEN):
    """Analytic matmul FLOPs per training step over REAL rows/edges.

    Counts dense matmul MACs x2 (the MFU convention) for: input
    projections, both GIN encoder stacks (SpMM counted as 2*E*d — the
    banded path executes it on the MXU), compressor, attention scorer,
    head MLP, InfoNCE gram, reconstruction gram + SDDMM.  Backward = 2x
    forward; Adam ~ 10 FLOPs/param."""
    def gin(rows, edges):
        f = 0.0
        # conv0: dt->d, d->d; conv1..: d->d twice
        f += rows * (dt * d + d * d) * 2.0
        f += (num_convs - 1) * rows * (2 * d * d) * 2.0
        f += num_convs * edges * d * 2.0          # SpMM per layer
        return f

    fwd = 0.0
    fwd += 2.0 * (n_rows + s_rows) * feat * dt    # transfer_d (x2 MACs)
    fwd += gin(n_rows, e_edges) + gin(s_rows, q_edges)
    fwd += n_rows * (d * d + d) * 2.0             # compressor fc1+fc2
    fwd += n_rows * (2 * d) * 2.0                 # attn scorer 2d->1
    fwd += n_rows * (2 * d * d + d * d) * 2.0     # head MLP 2d->d->d
    fwd += 2.0 * g_graphs * g_graphs * d * 2.0    # InfoNCE refl+betw grams
    fwd += n_rows * (2 * d) * (2 * d) * 2.0       # recon feature gram
    fwd += e_edges * (2 * d) * 2.0                # recon SDDMM
    return 3.0 * fwd + 10.0 * n_params


def _count_params(params):
    return int(sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params)))


def measure_rtt():
    """Dispatch+readback round-trip floor of a trivial jitted scalar op.

    On a local host this is ~100 us; through the axon tunnel it is the
    20-40 ms network round trip that every timed dispatch also pays."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    for _ in range(2):       # compile + settle (the per-process first-sync
        float(f(x))          # stall was already absorbed by _warm_device)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    # min, not median: the floor every timed dispatch necessarily pays;
    # stragglers above it are tunnel jitter, not device time
    return min(ts)


def measure_device(model, variables, g, sub, rtt_s):
    """On-device step time: non-donated lax.scan dispatches, RTT floor
    subtracted.  Returns (sec_per_step, median_dispatch_wall_s)."""
    tx = adam_l2(1e-4, weight_decay=5e-5)
    state = TrainState.create(
        jax.tree_util.tree_map(jnp.copy, variables), tx)
    # donate=False: donated-aliased outputs have returned early from both
    # block_until_ready AND scalar readbacks on this platform (round-2
    # artifact post-mortem, PERF.md) — the timed path takes no chances
    step = make_pretrain_scan_step(model, tx, INNER_STEPS, donate=False)
    rng = jax.random.PRNGKey(2)
    rng, k = jax.random.split(rng)
    _vlog("device-path compile...")
    state, losses = step(state, g, sub, k)        # compile + warmup
    float(np.asarray(losses.total)[-1])
    _vlog("device-path compiled")

    times = []
    for _ in range(DEVICE_REPS):
        rng, k = jax.random.split(rng)
        t0 = time.perf_counter()
        state, losses = step(state, g, sub, k)
        # readback of the final scanned loss: data-dependent on the whole
        # dispatch, so the wall time spans the full device execution
        float(np.asarray(losses.total)[-1])
        times.append(time.perf_counter() - t0)
    wall = statistics.median(times)
    sec_per_step = max(wall - rtt_s, 0.0) / INNER_STEPS
    return sec_per_step, wall


def measure_sustained(model, variables, ds, caps):
    """Production epoch-loop throughput: pack fresh batches (threaded C++
    packer), compress to the COMPACT wire format (graph/wire.py — delta/
    offset edge encoding, 2 bytes/edge), stack SUPER_K into ONE combined
    uint8 buffer, device_put in a BACKGROUND thread (upload overlaps
    compute), and scan real optimizer steps.

    Budget-aware: takes up to SUSTAINED_REPS readings but stops when the
    global budget is nearly spent.  Returns (median_rate, n_readings,
    wire_bytes_per_batch, per_rep) where per_rep carries each reading's
    rate AND the link weather measured next to it (MB/s + RTT), so
    cross-round comparisons can separate code changes from tunnel
    weather (VERDICT r4 next 8: the same code measured 0.98-1.74x as
    the link moved 58-94 MB/s)."""
    tx = adam_l2(1e-4, weight_decay=5e-5)
    state = TrainState.create(
        jax.tree_util.tree_map(jnp.copy, variables), tx)
    rng = jax.random.PRNGKey(3)
    compact = wire_compact_ok(ds)

    def _wire(b):
        return (to_wire_graph(b[0], compact=compact),
                to_wire_sub(b[1], compact=compact))

    def wired_forever(seed0):
        """Chain shuffled epochs so any batch budget is satisfiable; wire
        conversion runs inside the packer worker threads (transform=)."""
        s = seed0
        while True:
            yield from batch_iterator(ds, BATCH_GRAPHS, caps, shuffle=True,
                                      seed=s, workers=4, transform=_wire)
            s += 1

    def wire_groups(seed0):
        """Groups of SUPER_K per-batch wire pairs + their real edge count."""
        group = []
        for w in wired_forever(seed0):
            group.append(w)
            if len(group) == SUPER_K:
                edges = int(sum(int(wg.n_edges) + int(wv.n_edges)
                                for wg, wv in group))
                yield group, edges
                group = []

    # single-buffer transport: ONE uint8 device_put per superbatch
    # (wire.pack_bytes over the combined (gs, subs) tree) — per-transfer
    # round-trip latency, not bandwidth, dominates a tunneled link
    sample_group, _ = next(wire_groups(1234))
    spec = byte_spec_of(jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *sample_group))
    wire_bytes_per_batch = spec.total / SUPER_K
    _vlog(f"wire: {spec.total/1e6:.2f} MB/superbatch "
          f"({wire_bytes_per_batch/1e3:.0f} KB/batch, compact={compact})")
    # donate=False: donated-aliased outputs have returned early from
    # readbacks on this platform (round-2 post-mortem) — timed paths take
    # no chances
    step = make_pretrain_superbatch_step(model, tx, byte_spec=spec,
                                         donate=False)

    def superbatches(seed0):
        # direct per-batch writes into the combined buffer — no
        # intermediate stack copy (pack_bytes_grouped)
        for group, edges in wire_groups(seed0):
            yield pack_bytes_grouped(group, spec), edges

    def run_batches(n_batches, state, seed):
        """Returns (elapsed_s, real_edges_processed, state)."""
        nonlocal rng
        edges = 0
        losses = None
        t0 = time.perf_counter()
        done = 0
        # host_stage=2: pack/wire-serialize in their own thread so the
        # uploader thread only device_puts (pack ~70 ms/superbatch would
        # otherwise serialize with the put handoff)
        it = prefetch_to_device(superbatches(seed), size=3, host_stage=2)
        for buf, n_edges in it:
            edges += int(n_edges)   # prefetch device_put makes it a scalar
            rng, k = jax.random.split(rng)
            state, losses = step(state, buf, k)
            done += SUPER_K
            if done >= n_batches:
                break
        float(np.asarray(losses.total)[-1])   # real readback
        return time.perf_counter() - t0, edges, state

    # warmup: compile the superbatch step + fill packer caches
    _vlog("sustained warmup (compile)...")
    warm_t0 = time.perf_counter()
    _, _, state = run_batches(SUPER_K, state, seed=99)
    warm_dt = time.perf_counter() - warm_t0
    _vlog(f"sustained warmup done ({warm_dt:.1f}s)")

    _probe_buf = np.zeros(4 << 20, np.uint8)

    def link_probe():
        """Instantaneous link rate (MB/s) + RTT (ms) next to a reading."""
        jax.block_until_ready(jax.device_put(_probe_buf))
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(_probe_buf))
        rate = _probe_buf.nbytes / (time.perf_counter() - t0) / 1e6
        f = jax.jit(lambda x: x + 1.0)
        t0 = time.perf_counter()
        float(f(jnp.float32(0.0)))
        return round(rate, 1), round((time.perf_counter() - t0) * 1e3, 1)

    rates = []
    per_rep = []
    for i in range(SUSTAINED_REPS):
        # the first TWO readings always run: a reading costs ~1-3 s
        # (96 batches), nothing next to the warmup compile that may have
        # spent the budget — skipping them for budget reasons is how
        # round 3 ended with sustained null on the record
        if len(rates) >= 2 and _remaining() < 1.5 * last_dt + 10:
            _vlog(f"budget: stopping after {len(rates)} readings")
            break
        mbps, rtt_ms = link_probe()
        last_dt, edges, state = run_batches(SUSTAINED_BATCHES, state, seed=i)
        _vlog(f"sustained rep {i}: {edges/last_dt:.3e} edges/s "
              f"({last_dt*1e3/SUSTAINED_BATCHES:.2f} ms/batch, "
              f"link {mbps} MB/s rtt {rtt_ms} ms)")
        rates.append(edges / last_dt)
        per_rep.append({"edges_per_s": round(edges / last_dt, 1),
                        "ms_per_batch": round(
                            last_dt * 1e3 / SUSTAINED_BATCHES, 2),
                        "link_mbps": mbps, "rtt_ms": rtt_ms})
    if not rates:
        return None, 0, wire_bytes_per_batch, per_rep
    return statistics.median(rates), len(rates), wire_bytes_per_batch, \
        per_rep


def main():
    import threading

    _vlog(f"budget {BUDGET_S:.0f}s (from first-sync warmup)")
    warm = threading.Thread(target=_warm_device, daemon=True)
    warm.start()
    graphs = random_dataset(BATCH_GRAPHS, seed=0, min_nodes=10, max_nodes=30,
                            feat_dim=FEAT)
    egos = [extract_egonets(g, 1) for g in graphs]
    banded = {"0": False, "host": True, "1": True}.get(
        os.environ.get("BENCH_BANDED", "device"), "device")
    # size the padded buffers from the distribution, not worst-case
    # constants (same sqrt-sigma plan the production loader uses)
    dcaps = plan_capacities(GraphDataset(list(graphs), k=1, egonets=egos),
                            BATCH_GRAPHS)
    NODE_CAP, EDGE_CAP = dcaps.nodes, dcaps.edges
    SUB_NODE_CAP, SUB_EDGE_CAP = dcaps.sub_nodes, dcaps.sub_edges
    _vlog(f"device-path caps: nodes {NODE_CAP} edges {EDGE_CAP} "
          f"sub {SUB_NODE_CAP}/{SUB_EDGE_CAP}")
    g = pack_graphs(graphs, NODE_CAP, EDGE_CAP, BATCH_GRAPHS,
                    banded=banded)
    coo_sub = pack_subgraphs(graphs, egos, SUB_NODE_CAP, SUB_EDGE_CAP,
                             banded=banded)

    real_edges = int(np.asarray(g.edge_mask).sum())
    real_sub_edges = int(np.asarray(coo_sub.edge_mask).sum())
    edges_per_step = real_edges + real_sub_edges

    mode = os.environ.get("BENCH_SUBGRAPH_MODE", "coo")
    if mode == "dense":
        s_max = ((max_egonet_size(egos) + 7) // 8) * 8
        sub = pack_subgraphs_dense(graphs, egos, NODE_CAP, s_max)
    else:
        sub = coo_sub

    # sustained pool (packed while the channel warms)
    pool = random_dataset(DATASET_GRAPHS, seed=7, min_nodes=10,
                          max_nodes=30, feat_dim=FEAT)
    ds = GraphDataset(pool, k=1)
    caps = plan_capacities(ds, BATCH_GRAPHS)

    _vlog("packed; waiting for first-sync warmup")
    warm.join()
    _BUDGET_FROM[0] = time.perf_counter()
    _vlog("device channel warm; uploading batch")
    g = jax.device_put(g)
    sub = jax.device_put(sub)

    impl = os.environ.get("BENCH_RECONS_IMPL", "gram")
    model = PretrainModel(in_dim=FEAT, hidden=HIDDEN, d_transfer=DT,
                          recons_impl=impl, subgraph_mode=mode)
    _vlog("model.init...")
    # jit the init: un-jitted flax init dispatches op-by-op, paying the
    # tunnel RTT per op (~2 min wall); jitted it is one compile
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g, sub, train=True)
    _vlog("model.init done")

    rtt_s = measure_rtt()
    _vlog(f"RTT floor {rtt_s*1e3:.1f} ms")

    baseline = DEFAULT_BASELINE_EDGES_PER_S
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE.json")) as f:
            b = json.load(f)
        baseline = float(b.get("throughput_edges_per_s", baseline))
    except Exception:
        pass

    results = {
        "sustained_edges_per_s": None, "sustained_reps": 0,
        "wire_kb_per_batch": None, "device_edges_per_s": None,
        "device_us_per_step": None, "dispatch_wall_ms": None,
        "mfu": None, "flops": None, "link_mbps": None,
        "sustained_per_rep": [], "sustained_comp_edges_per_s": None,
    }

    def emit():
        """Headline value = SUSTAINED (the apples-to-apples number: the
        reference's loop also pays collate + H2D per batch,
        exp_pretraining.py:94-99); the device-only scan ceiling ships as
        device_* fields (ADVICE round 3: value/vs_baseline must not mix
        the two)."""
        sus = results["sustained_edges_per_s"]
        dev = results["device_edges_per_s"]
        value = sus if sus else dev
        out = {
            "metric": "pretrain_edges_per_s_per_chip",
            "value": round(value, 1) if value else None,
            "unit": "edges/s/chip",
            "vs_baseline": (round(value / baseline, 3) if value else None),
            "value_kind": ("sustained_production_loop" if sus
                           else "device_scan_ceiling"),
            "sustained_edges_per_s": (round(sus, 1) if sus else None),
            "sustained_vs_baseline": (round(sus / baseline, 3)
                                      if sus else None),
            "sustained_reps": results["sustained_reps"],
            "sustained_per_rep": results["sustained_per_rep"],
            "sustained_comp_edges_per_s":
                results["sustained_comp_edges_per_s"],
            "sustained_comp_vs_baseline": (
                round(results["sustained_comp_edges_per_s"] / baseline, 3)
                if results["sustained_comp_edges_per_s"] else None),
            "wire_kb_per_batch": results["wire_kb_per_batch"],
            "device_edges_per_s": (round(dev, 1) if dev else None),
            "device_vs_baseline": (round(dev / baseline, 3)
                                   if dev else None),
            "device_us_per_step": results["device_us_per_step"],
            "mfu": results["mfu"],
            "model_flops_per_step": results["flops"],
            "timing": {
                "method": ("non-donated dispatches, RTT floor "
                           "subtracted; sustained = wall clock over "
                           "fresh-packed wire superbatches"),
                "inner_steps": INNER_STEPS,
                "rtt_ms": round(rtt_s * 1e3, 2),
                "dispatch_wall_ms": results["dispatch_wall_ms"],
            },
            "host_link_mbytes_per_s": results["link_mbps"],
            "wall_s": round(time.perf_counter() - _T0, 1),
            "first_sync_stall_s": round(_BUDGET_FROM[0] - _T0, 1),
        }
        print(json.dumps(out), flush=True)

    # --- sustained epoch-loop path FIRST (the round-3 verdict item: this
    # is the number that must land on the record; the device path has
    # three rounds of record behind it) --------------------------------
    if not os.environ.get("BENCH_SKIP_SUSTAINED"):
        try:
            sus, reps, wire_b, per_rep = measure_sustained(
                model, variables, ds, caps)
            results["sustained_edges_per_s"] = sus
            results["sustained_reps"] = reps
            results["wire_kb_per_batch"] = round(wire_b / 1e3, 1)
            results["sustained_per_rep"] = per_rep
            # link-weather-compensated median: re-predict each reading's
            # per-batch time at a fixed reference link rate (default
            # 75 MB/s, the round-4 session middle) by swapping the wire
            # transfer term — valid while the loop is transfer-bound or
            # near it; raw readings stay on the record beside it
            ref = float(os.environ.get("BENCH_REF_LINK_MBPS", "75")) * 1e6
            comp = []
            for r in per_rep:
                if not r["link_mbps"]:
                    continue
                t_b = r["ms_per_batch"] / 1e3
                t_comp = max(t_b - wire_b / (r["link_mbps"] * 1e6)
                             + wire_b / ref, 1e-6)
                comp.append(r["edges_per_s"] * t_b / t_comp)
            if comp:
                results["sustained_comp_edges_per_s"] = round(
                    statistics.median(comp), 1)
        except Exception as exc:                      # noqa: BLE001
            _vlog(f"sustained phase failed: {exc!r}")
    emit()   # provisional: sustained stands even if the rest is killed

    # --- device path + MFU ------------------------------------------------
    if _remaining() > 30:
        sec_per_step, dispatch_wall = measure_device(model, variables, g,
                                                     sub, rtt_s)
        results["device_edges_per_s"] = edges_per_step / sec_per_step
        results["device_us_per_step"] = round(sec_per_step * 1e6, 2)
        results["dispatch_wall_ms"] = round(dispatch_wall * 1e3, 2)
        _vlog(f"device step {sec_per_step*1e6:.0f} us "
              f"(dispatch wall {dispatch_wall*1e3:.0f} ms)")

        n_rows = int(np.asarray(g.node_mask).sum())
        s_rows = int(np.asarray(coo_sub.node_mask).sum())
        flops = flop_model(n_rows, s_rows, real_edges, real_sub_edges,
                           BATCH_GRAPHS, _count_params(variables["params"]))
        peak = float(os.environ.get("BENCH_PEAK_FLOPS", DEFAULT_PEAK_FLOPS))
        results["mfu"] = round(flops / sec_per_step / peak, 4)
        results["flops"] = round(flops)
    else:
        _vlog("skipping device phase (budget)")

    # host->device link bandwidth (context for the sustained number: on a
    # tunneled chip the link, not the chip or the host pipeline, bounds it)
    if _remaining() > 10:
        probe = np.zeros((8 << 20) // 4, np.float32)
        jax.block_until_ready(jax.device_put(probe))     # warm the path
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(probe))
        results["link_mbps"] = round(
            probe.nbytes / (time.perf_counter() - t0) / 1e6, 1)

    emit()


if __name__ == "__main__":
    main()
