"""Why doesn't prefetch_to_device(size=3) hide the superbatch upload?

VERDICT r4 weak 3 / next 2: the sustained loop measures ADDITIVE
upload + compute (~93 + ~90 ms per superbatch) despite a background
device_put thread.  This probe isolates the four candidate serializers
on the tunneled axon runtime:

  A. device_put wall time, idle device        (baseline transfer cost)
  B. device_put WHILE a long scan runs        (transfer vs compute overlap)
  C. device_put while the HOST packs          (GIL/CPU contention)
  D. full pipeline: 1-stage worker (pack+put serial) vs 2-stage
     (pack thread | put thread)               (the proposed fix)

Writes runs/overlap_probe.json.
"""
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

MB = 5.4  # superbatch wire size at bench shapes
BUF = np.zeros(int(MB * 1e6), np.uint8)

out = {}


def timeit(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return [round(t * 1e3, 1) for t in ts]


# warm the channel
float(jax.jit(lambda x: x + 1)(jnp.float32(0)))
print("channel warm", flush=True)

# --- A: idle-device upload ------------------------------------------------
def put_one():
    jax.block_until_ready(jax.device_put(BUF))


put_one()
out["A_put_idle_ms"] = timeit(put_one)
print("A", out["A_put_idle_ms"], flush=True)

# --- B: upload while device computes -------------------------------------
# a ~500 ms compute: matmul chain scan
W = jax.device_put(np.random.default_rng(0).standard_normal(
    (2048, 2048), np.float32))


@jax.jit
def burn(w):
    def body(c, _):
        return jnp.tanh(c @ w) * 0.999, ()
    c, _ = jax.lax.scan(body, w, None, length=60)
    return c.sum()


float(burn(W))  # compile
t0 = time.perf_counter()
r = burn(W)
float(r)
burn_ms = (time.perf_counter() - t0) * 1e3
out["burn_ms"] = round(burn_ms, 1)
print("burn", burn_ms, flush=True)


def b_trial():
    r = burn(W)          # async dispatch
    t0 = time.perf_counter()
    put_one()            # upload while the chip is busy
    dt = (time.perf_counter() - t0) * 1e3
    float(r)
    return dt


b_trial()
out["B_put_during_compute_ms"] = [round(b_trial(), 1) for _ in range(5)]
print("B", out["B_put_during_compute_ms"], flush=True)

# --- C: upload while host CPU is busy ------------------------------------
stop = threading.Event()


def hog():
    x = np.random.default_rng(1).standard_normal(512 * 512)
    while not stop.is_set():
        # small-op python/numpy loop: holds and releases the GIL rapidly,
        # like the packer threads
        for _ in range(50):
            (x * 1.0001).sum()


hogs = [threading.Thread(target=hog, daemon=True) for _ in range(2)]
for h in hogs:
    h.start()
out["C_put_host_busy_ms"] = timeit(put_one)
stop.set()
print("C", out["C_put_host_busy_ms"], flush=True)

# --- D: pipeline shapes ---------------------------------------------------
# simulate: pack = 80 ms of numpy memcpy work; upload = real device_put;
# compute = burn scaled to ~90 ms
SRC = np.zeros(int(40e6), np.uint8)


def fake_pack():
    # ~80 ms of real memory traffic on this host
    t0 = time.perf_counter()
    while (time.perf_counter() - t0) < 0.080:
        SRC[: int(8e6)].copy()
    return BUF


@jax.jit
def burn90(w):
    def body(c, _):
        return jnp.tanh(c @ w) * 0.999, ()
    c, _ = jax.lax.scan(body, w, None, length=max(1, int(60 * 90 / max(burn_ms, 1))))
    return c.sum()


float(burn90(W))

from scgib_tpu.data.loader import prefetch_to_device  # noqa: E402

N = 8


def gen():
    for _ in range(N):
        yield fake_pack()


def run(host_stage):
    t0 = time.perf_counter()
    r = None
    for buf in prefetch_to_device(gen(), size=3, host_stage=host_stage):
        r = burn90(W)      # stands in for the superbatch step
    float(r)
    return round((time.perf_counter() - t0) / N * 1e3, 1)


run(0)
out["D_1stage_ms_per_super"] = [run(0) for _ in range(3)]
print("D1", out["D_1stage_ms_per_super"], flush=True)
out["D_2stage_ms_per_super"] = [run(2) for _ in range(3)]
print("D2", out["D_2stage_ms_per_super"], flush=True)

with open("/root/repo/runs/overlap_probe.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
