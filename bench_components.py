"""Component-level timing of the pretraining step (not the driver bench).

Times, each as a 20x lax.scan'd jitted call on the bench batch:
  encoder1 fwd, encoder1+2 fwd, full extract_features fwd,
  full loss fwd, full loss fwd+bwd (no opt), full train step.
Prints one line per component.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import (BATCH_GRAPHS, EDGE_CAP, FEAT, NODE_CAP, SUB_EDGE_CAP,
                   SUB_NODE_CAP)
from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.batching import pack_graphs, pack_subgraphs
from scgib_tpu.graph.egonet import extract_egonets
from scgib_tpu.models.scgib import PretrainModel
from scgib_tpu.train.trainer import (TrainState, adam_l2,
                                     make_pretrain_scan_step)

INNER = 20


def timed(name, fn, *args):
    out = fn(*args)                      # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (3 * INNER)
    print(f"{name:28s} {dt*1e3:8.3f} ms/step")
    return dt


def scan20(f):
    def wrapped(*args):
        def body(c, i):
            return c, f(*args, jax.random.fold_in(jax.random.PRNGKey(0), i))
        _, ys = jax.lax.scan(body, 0, jnp.arange(INNER))
        return ys
    return jax.jit(wrapped)


def main():
    graphs = random_dataset(BATCH_GRAPHS, seed=0, min_nodes=10,
                            max_nodes=30, feat_dim=FEAT)
    egos = [extract_egonets(g, 1) for g in graphs]
    g = pack_graphs(graphs, NODE_CAP, EDGE_CAP, BATCH_GRAPHS)
    sub = pack_subgraphs(graphs, egos, SUB_NODE_CAP, SUB_EDGE_CAP)

    model = PretrainModel(in_dim=FEAT, hidden=64, d_transfer=32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g, sub, train=True)

    def enc1(v, g_, sub_, rng):
        def f(m, g2, sub2):
            xp = m.transfer_d(g2.node_feat)
            return m.core.encoder1(xp, g2.senders, g2.receivers,
                                   node_mask=g2.node_mask,
                                   edge_mask=g2.edge_mask, train=True)
        out, _ = model.apply(v, g_, sub_, method=f,
                             mutable=["batch_stats"], rngs={"noise": rng})
        return jnp.sum(out)

    def enc12(v, g_, sub_, rng):
        def f(m, g2, sub2):
            xp = m.transfer_d(g2.node_feat)
            xs = m.transfer_d(sub2.node_feat)
            h1 = m.core.encoder1(xp, g2.senders, g2.receivers,
                                 node_mask=g2.node_mask,
                                 edge_mask=g2.edge_mask, train=True)
            h2 = m.core.encoder2(xs, sub2.senders, sub2.receivers,
                                 node_mask=sub2.node_mask,
                                 edge_mask=sub2.edge_mask, train=True)
            return jnp.sum(h1) + jnp.sum(h2)
        out, _ = model.apply(v, g_, sub_, method=f,
                             mutable=["batch_stats"], rngs={"noise": rng})
        return out

    def feats(v, g_, sub_, rng):
        def f(m, g2, sub2):
            xp = m.transfer_d(g2.node_feat)
            xs = m.transfer_d(sub2.node_feat)
            fe = m.core.extract_features(g2, sub2, xp, xs, train=True)
            return jnp.sum(fe.interaction_map)
        out, _ = model.apply(v, g_, sub_, method=f,
                             mutable=["batch_stats"], rngs={"noise": rng})
        return out

    def loss_fwd(v, g_, sub_, rng):
        losses, _ = model.apply(v, g_, sub_, train=True,
                                mutable=["batch_stats"],
                                rngs={"noise": rng})
        return losses.total

    def loss_bwd(v, g_, sub_, rng):
        def f(p):
            losses, _ = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                g_, sub_, train=True, mutable=["batch_stats"],
                rngs={"noise": rng})
            return losses.total
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b), jax.grad(f)(v["params"]), 0.0)

    timed("encoder1 fwd", scan20(enc1), variables, g, sub)
    timed("encoder1+2 fwd", scan20(enc12), variables, g, sub)
    timed("extract_features fwd", scan20(feats), variables, g, sub)
    timed("full losses fwd", scan20(loss_fwd), variables, g, sub)
    timed("full losses fwd+bwd", scan20(loss_bwd), variables, g, sub)

    tx = adam_l2(1e-4, weight_decay=5e-5)
    state = TrainState.create(variables, tx)
    step = make_pretrain_scan_step(model, tx, INNER, donate=False)
    rng = jax.random.PRNGKey(2)
    state, losses = step(state, g, sub, rng)
    jax.block_until_ready(losses.total)
    t0 = time.perf_counter()
    for _ in range(3):
        state, losses = step(state, g, sub, rng)
    jax.block_until_ready(losses.total)
    dt = (time.perf_counter() - t0) / (3 * INNER)
    print(f"{'full train step':28s} {dt*1e3:8.3f} ms/step")


if __name__ == "__main__":
    main()
