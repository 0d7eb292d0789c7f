"""Microbench: one GIN conv layer (pre-BN) over the pretraining batch's
ego-net node array, three ways:

  gather   — jnp.take + sorted segment-sum (the default COO path)
  banded   — banded block-dense SpMM, XLA (dynamic_slice + batched matmul)
  pallas   — fused banded Pallas kernel (SpMM + both MLP matmuls)

Each timed as 50 scanned iterations inside one jitted call.
Prints one line per variant: ms/layer and effective GFLOP/s of the MLP.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.banded import pack_banded
from scgib_tpu.graph.batching import pack_graphs, pack_subgraphs
from scgib_tpu.graph.egonet import extract_egonets
from scgib_tpu.ops.pallas.banded import gin_banded_layer
from scgib_tpu.ops.spmm import gather_sum
from scgib_tpu.ops.spmm_banded import banded_spmm

D = 64
TILE, BAND = 128, 256


def timed_call(fn, *args, reps=2):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def timed(name, make_fn, args, flops=0):
    short, long_ = 8, 40
    t_s = timed_call(scanN(make_fn, short), *args)
    t_l = timed_call(scanN(make_fn, long_), *args)
    t_layer = (t_l - t_s) / (long_ - short)   # slope removes dispatch RTT
    gflops = flops / t_layer / 1e9 if flops else 0.0
    print(f"{name:24s} {t_layer*1e6:9.1f} us/layer   "
          f"{gflops:8.1f} GFLOP/s   (rtt~{(t_s - short*t_layer)*1e3:.1f}ms)")
    return t_layer


def scanN(f, length):
    def wrapped(h0, *args):
        def body(h, _):
            out = f(h, *args)
            # renormalize so values stay finite while keeping a REAL
            # data dependence between iterations (no loop hoisting)
            return out / (1.0 + jnp.max(jnp.abs(out))), None
        h, _ = jax.lax.scan(body, h0, None, length=length)
        return h
    return jax.jit(wrapped)


def main():
    graphs = random_dataset(128, seed=0, min_nodes=10, max_nodes=30,
                            feat_dim=9)
    egos = [extract_egonets(g, 1) for g in graphs]
    sub = pack_subgraphs(graphs, egos, 16384, 65536)

    n = sub.node_center.shape[0]
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(n, D)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(np.zeros(D, np.float32))
    w2 = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(np.zeros(D, np.float32))

    banded = pack_banded(np.asarray(sub.senders),
                         np.asarray(sub.receivers),
                         np.asarray(sub.edge_mask), n, TILE, BAND)
    blocks = jnp.asarray(banded.blocks)
    coff = jnp.asarray(banded.col_off)
    real_edges = int(np.asarray(sub.edge_mask).sum())
    mlp_flops = 2 * n * D * D * 2
    spmm_flops_banded = 2 * blocks.size // BAND * BAND * D
    print(f"N={n} real_edges={real_edges} "
          f"banded_blocks={banded.blocks.shape}")

    def gather_layer(hh):
        agg = gather_sum(hh, sub.senders, sub.receivers, n, sub.edge_mask)
        return jnp.maximum((hh + agg) @ w1 + b1, 0.0) @ w2 + b2

    def banded_layer(hh):
        agg = banded_spmm(blocks, coff, hh)
        return jnp.maximum((hh + agg) @ w1 + b1, 0.0) @ w2 + b2

    def pallas_layer(hh):
        return gin_banded_layer(blocks, coff, hh, w1, b1, w2, b2)

    flops = mlp_flops + spmm_flops_banded
    timed("gather+segment (XLA)", gather_layer, (h,), flops=flops)
    timed("banded spmm (XLA)", banded_layer, (h,), flops=flops)
    timed("banded fused (Pallas)", pallas_layer, (h,), flops=flops)

    # forward + backward (grad wrt h AND weights), ~3x forward FLOPs
    def grad_layer(layer):
        def f(hh):
            def loss(hh_, w1_, w2_):
                return jnp.sum(layer_p(hh_, w1_, w2_) ** 2)

            def layer_p(hh_, w1_, w2_):
                if layer == "gather":
                    agg = gather_sum(hh_, sub.senders, sub.receivers, n,
                                     sub.edge_mask)
                    return jnp.maximum((hh_ + agg) @ w1_ + b1, 0.0) \
                        @ w2_ + b2
                if layer == "banded":
                    agg = banded_spmm(blocks, coff, hh_)
                    return jnp.maximum((hh_ + agg) @ w1_ + b1, 0.0) \
                        @ w2_ + b2
                return gin_banded_layer(blocks, coff, hh_, w1_, b1, w2_,
                                        b2)

            dh, dw1, dw2 = jax.grad(loss, argnums=(0, 1, 2))(hh, w1, w2)
            return dh + dw1.sum() + dw2.sum()
        return f

    bflops = 3 * flops
    timed("gather fwd+bwd", grad_layer("gather"), (h,), flops=bflops)
    timed("banded fwd+bwd", grad_layer("banded"), (h,), flops=bflops)
    timed("pallas fwd+bwd", grad_layer("pallas"), (h,), flops=bflops)


if __name__ == "__main__":
    main()
