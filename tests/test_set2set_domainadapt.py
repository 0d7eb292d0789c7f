"""Numeric tests for Set2Set pooling and the domain-adaptation model.

Set2Set is checked against a NumPy oracle that replays the exact
algorithm (LSTM over q_star, within-graph softmax attention readout,
reference models.py:565/515 uses DGL Set2Set(hidden, 2, 1)); the
domain-adapt model (Mainmodel_domainadapt, models.py:107-355) is checked
for padding invariance and that its unnormalized squared-error loss
(models.py:276-281) trains.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scgib_tpu.models.set2set import Set2Set


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _lstm_step(params, carry, x):
    """Replay the flax LSTM cell (per-gate dense params: i{i,f,g,o} input
    kernels without bias, h{i,f,g,o} hidden kernels with bias)."""
    c, h = carry

    def gate(name):
        y = x @ np.asarray(params["i" + name]["kernel"]) + \
            h @ np.asarray(params["h" + name]["kernel"]) + \
            np.asarray(params["h" + name]["bias"])
        return y

    i, f, g, o = gate("i"), gate("f"), gate("g"), gate("o")
    c = _sigmoid(f) * c + _sigmoid(i) * np.tanh(g)
    h = _sigmoid(o) * np.tanh(c)
    return (c, h), h


def _set2set_oracle(params, x, seg, num_graphs, mask, n_iters=2):
    d = x.shape[1]
    q_star = np.zeros((num_graphs, 2 * d), np.float64)
    carry = (np.zeros((num_graphs, d)), np.zeros((num_graphs, d)))
    for _ in range(n_iters):
        carry, q = _lstm_step(params, carry, q_star)
        e = (x * q[seg]).sum(-1)
        e = np.where(mask, e, -np.inf)
        a = np.zeros_like(e)
        for g in range(num_graphs):
            sel = (seg == g) & mask
            if sel.any():
                z = np.exp(e[sel] - e[sel].max())
                a[sel] = z / z.sum()
        r = np.zeros((num_graphs, d))
        for v in range(len(x)):
            if mask[v]:
                r[seg[v]] += a[v] * x[v]
        q_star = np.concatenate([q, r], -1)
    return q_star


def test_set2set_matches_oracle():
    rng = np.random.default_rng(0)
    n, d, G = 17, 8, 4
    x = rng.normal(size=(n, d)).astype(np.float32)
    seg = np.sort(rng.integers(0, G, size=n)).astype(np.int32)
    mask = np.ones(n, bool)
    mask[-3:] = False          # padded tail nodes
    seg[-3:] = G - 1

    model = Set2Set(hidden=d)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(seg), G, mask=jnp.asarray(mask))
    out = model.apply(variables, jnp.asarray(x), jnp.asarray(seg), G,
                      mask=jnp.asarray(mask))
    lstm_params = jax.tree.map(np.asarray,
                               variables["params"]["lstm"])
    want = _set2set_oracle(lstm_params, x.astype(np.float64), seg, G, mask)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-5, atol=2e-5)


def test_set2set_padding_invariance():
    """Appending masked pad nodes must not change any graph's readout."""
    rng = np.random.default_rng(1)
    n, d, G = 10, 6, 2
    x = rng.normal(size=(n, d)).astype(np.float32)
    seg = np.asarray([0] * 5 + [1] * 5, np.int32)
    mask = np.ones(n, bool)

    model = Set2Set(hidden=d)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(seg), G, mask=jnp.asarray(mask))
    base = model.apply(variables, jnp.asarray(x), jnp.asarray(seg), G,
                       mask=jnp.asarray(mask))

    x_pad = np.concatenate([x, rng.normal(size=(4, d)).astype(np.float32)])
    seg_pad = np.concatenate([seg, np.full(4, G - 1, np.int32)])
    mask_pad = np.concatenate([mask, np.zeros(4, bool)])
    padded = model.apply(variables, jnp.asarray(x_pad),
                         jnp.asarray(seg_pad), G, mask=jnp.asarray(mask_pad))
    np.testing.assert_allclose(np.asarray(base), np.asarray(padded),
                               rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# domain adaptation
# ---------------------------------------------------------------------------

def _build(n_graphs=6, seed=0, caps=(128, 512, 512, 2048)):
    from scgib_tpu.data.synthetic import random_dataset
    from scgib_tpu.graph.batching import pack_graphs, pack_subgraphs
    from scgib_tpu.graph.egonet import extract_egonets

    graphs = random_dataset(n_graphs, seed=seed, min_nodes=6, max_nodes=12,
                            feat_dim=9)
    egos = [extract_egonets(g, 1) for g in graphs]
    g = pack_graphs(graphs, caps[0], caps[1], n_graphs)
    sub = pack_subgraphs(graphs, egos, caps[2], caps[3])
    return graphs, egos, g, sub


def test_domainadapt_padding_invariance():
    """The squared-error loss sums over real graphs only — growing the pad
    capacities must not change it."""
    from scgib_tpu.models.scgib import DomainAdaptModel

    graphs, egos, g, sub = _build()
    model = DomainAdaptModel(in_dim=9, hidden=16, d_transfer=8)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g, sub, train=True)
    loss = model.apply(variables, g, sub, train=False,
                       rngs={"noise": jax.random.PRNGKey(2)})

    from scgib_tpu.graph.batching import pack_graphs, pack_subgraphs

    g2 = pack_graphs(graphs, 256, 1024, 8)
    sub2 = pack_subgraphs(graphs, egos, 1024, 4096)
    loss2 = model.apply(variables, g2, sub2, train=False,
                        rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(float(loss), float(loss2),
                               rtol=1e-4, atol=1e-4)


def test_domainadapt_trains():
    """A few Adam steps reduce the adaptation loss (models.py:276-281
    objective is trainable end to end)."""
    from scgib_tpu.models.scgib import DomainAdaptModel
    from scgib_tpu.train.trainer import (TrainState, adam_l2,
                                         make_domainadapt_step)

    _, _, g, sub = _build()
    model = DomainAdaptModel(in_dim=9, hidden=16, d_transfer=8)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g, sub, train=True)
    tx = adam_l2(1e-3, weight_decay=1e-5)
    state = TrainState.create(variables, tx)
    step = make_domainadapt_step(model, tx)

    rng = jax.random.PRNGKey(3)
    losses = []
    for i in range(12):
        rng, k = jax.random.split(rng)
        state, loss = step(state, g, sub, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_egonets_k5_full_coverage():
    """On a path graph, k=5 ego-nets reach the full 5-hop neighborhood
    (the peptides configuration precomputes k=1..5,
    exp_pep_func_5.py:369-381)."""
    from scgib_tpu.graph.batching import GraphData, symmetrize_edges
    from scgib_tpu.graph.egonet import extract_egonets

    n = 12
    s = np.arange(n - 1, dtype=np.int32)
    r = np.arange(1, n, dtype=np.int32)
    s, r = symmetrize_edges(s, r)
    gd = GraphData(senders=s, receivers=r,
                   node_feat=np.eye(n, 9, dtype=np.float32))
    ego = extract_egonets(gd, 5)
    for v in range(n):
        want = {u for u in range(n) if abs(u - v) <= 5}
        assert set(np.asarray(ego.node_lists[v]).tolist()) == want
