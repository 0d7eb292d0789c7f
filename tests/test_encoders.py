"""Encoder golden tests vs dense NumPy references: GCN normalization,
GraphSAGE (including the faithful layer-repeat bug), GraphTransformer
edge-softmax, and the s2s readout / logM pretraining paths."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.batching import pack_graphs, pack_subgraphs
from scgib_tpu.graph.egonet import extract_egonets
from scgib_tpu.models.encoders import GCN, GraphSAGE, GraphTransformer

FEAT = 6


@pytest.fixture(scope="module")
def batch():
    graphs = random_dataset(4, seed=23, min_nodes=5, max_nodes=10,
                            feat_dim=FEAT)
    g = pack_graphs(graphs, 64, 256, 4)
    return graphs, g


def dense_adj(g):
    n = g.num_nodes
    A = np.zeros((n, n))
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    m = np.asarray(g.edge_mask)
    A[s[m], r[m]] = 1.0
    return A


def test_gcn_matches_dense(batch):
    graphs, g = batch
    model = GCN(hidden=8)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(g.num_nodes, FEAT)).astype(np.float32))
    x = x * g.node_mask.astype(x.dtype)[:, None]
    v = model.init(jax.random.PRNGKey(0), x, g.senders, g.receivers,
                   node_mask=g.node_mask, edge_mask=g.edge_mask)
    got = model.apply(v, x, g.senders, g.receivers, node_mask=g.node_mask,
                      edge_mask=g.edge_mask)

    # dense reference: h <- relu(D_in^-1/2 A D_out^-1/2-normalized agg @ W)
    A = dense_adj(g)
    out_deg = A.sum(axis=1)
    in_deg = A.sum(axis=0)
    sn = np.where(out_deg > 0, out_deg ** -0.5, 0.0)
    dn = np.where(in_deg > 0, in_deg ** -0.5, 0.0)
    h = np.asarray(x, dtype=np.float64)
    p = jax.tree_util.tree_map(np.asarray, v["params"])
    for i in range(3):
        agg = (A.T @ (h * sn[:, None])) * dn[:, None]
        h = agg @ p[f"conv{i}"]["kernel"] + p[f"conv{i}"]["bias"]
        if i < 2:
            h = np.maximum(h, 0)
        h = h * np.asarray(g.node_mask)[:, None]
    np.testing.assert_allclose(np.asarray(got), h, rtol=1e-4, atol=1e-4)


def test_sage_faithful_bug(batch):
    graphs, g = batch
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(g.num_nodes, 8)).astype(np.float32))
    buggy = GraphSAGE(hidden=8, faithful_bug=True)
    fixed = GraphSAGE(hidden=8, faithful_bug=False)
    # init via the fixed variant so conv2's params exist (the buggy
    # path never calls layer 2 — exactly the bug being replicated)
    v = fixed.init(jax.random.PRNGKey(0), x, g.senders, g.receivers,
                   node_mask=g.node_mask, edge_mask=g.edge_mask)
    out_b = buggy.apply(v, x, g.senders, g.receivers,
                        node_mask=g.node_mask, edge_mask=g.edge_mask)
    out_f = fixed.apply(v, x, g.senders, g.receivers,
                        node_mask=g.node_mask, edge_mask=g.edge_mask)
    # same params, different third conv: outputs must differ
    assert not np.allclose(np.asarray(out_b), np.asarray(out_f))

    # dense reference of the buggy path: conv2 applied twice
    A = dense_adj(g)
    deg = A.sum(axis=0).clip(1)
    p = jax.tree_util.tree_map(np.asarray, v["params"])
    h = np.asarray(x, np.float64)

    def conv(i, z):
        neigh = (A.T @ z) / deg[:, None]
        return (z @ p[f"self{i}"]["kernel"] + p[f"self{i}"]["bias"]
                + neigh @ p[f"neigh{i}"]["kernel"])

    m = np.asarray(g.node_mask)[:, None]
    h = np.maximum(conv(0, h), 0) * m
    h = np.maximum(conv(1, h), 0) * m
    h = conv(1, h) * m
    np.testing.assert_allclose(np.asarray(out_b), h, rtol=1e-4, atol=1e-4)


def test_transformer_edge_softmax(batch):
    """One-layer graph transformer vs a dense NumPy reference with the
    clamp+exp (unshifted) normalization of models.py:899/917."""
    graphs, g = batch
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(g.num_nodes, 8)).astype(np.float32))
    x = x * g.node_mask.astype(x.dtype)[:, None]
    model = GraphTransformer(hidden=8, num_layers=0, num_heads=2)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, g.senders,
                   g.receivers, node_mask=g.node_mask,
                   edge_mask=g.edge_mask, train=False)
    got = model.apply(v, x, g.senders, g.receivers, node_mask=g.node_mask,
                      edge_mask=g.edge_mask, train=False)

    p = jax.tree_util.tree_map(np.asarray, v["params"])
    h = np.asarray(x, np.float64) @ p["embed"]["kernel"]
    h = h * np.asarray(g.node_mask)[:, None]
    from scgib_tpu.models.encoders import gt_layer_params

    lp = gt_layer_params(p, 0)
    n = h.shape[0]
    heads, hd = 2, 4
    d = heads * hd
    if "qkv" in lp:         # fused-QKV storage (default layout)
        qkv = h @ lp["qkv"]["kernel"] + lp["qkv"]["bias"]
        q = qkv[:, :d].reshape(n, heads, hd)
        k = qkv[:, d:2 * d].reshape(n, heads, hd)
        vv = qkv[:, 2 * d:].reshape(n, heads, hd)
    else:
        q = (h @ lp["Q"]["kernel"] + lp["Q"]["bias"]).reshape(n, heads, hd)
        k = (h @ lp["K"]["kernel"] + lp["K"]["bias"]).reshape(n, heads, hd)
        vv = (h @ lp["V"]["kernel"] + lp["V"]["bias"]).reshape(n, heads, hd)
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    m = np.asarray(g.edge_mask)
    attn = np.zeros((n, heads, hd))
    denom = np.zeros((n, heads))
    for e in range(len(s)):
        if not m[e]:
            continue
        score = (k[s[e]] * q[r[e]]).sum(-1) / np.sqrt(hd)
        w = np.exp(np.clip(score, -5, 5))
        denom[r[e]] += w
        attn[r[e]] += w[:, None] * vv[s[e]]
    attn = attn / (denom + 1e-6)[:, :, None]
    o = attn.reshape(n, 8) @ lp["O"]["kernel"] + lp["O"]["bias"]
    z = h + o
    mu = z.mean(-1, keepdims=True)
    var = z.var(-1, keepdims=True)
    z = (z - mu) / np.sqrt(var + 1e-6) * lp["ln1"]["scale"] + \
        lp["ln1"]["bias"]
    f = np.maximum(z @ lp["ffn1"]["kernel"] + lp["ffn1"]["bias"], 0)
    f = f @ lp["ffn2"]["kernel"] + lp["ffn2"]["bias"]
    z2 = z + f
    mu = z2.mean(-1, keepdims=True)
    var = z2.var(-1, keepdims=True)
    z2 = (z2 - mu) / np.sqrt(var + 1e-6) * lp["ln2"]["scale"] + \
        lp["ln2"]["bias"]
    z2 = z2 * np.asarray(g.node_mask)[:, None]
    np.testing.assert_allclose(np.asarray(got), z2, rtol=2e-3, atol=2e-3)


def test_s2s_readout_and_logm_paths():
    """The readout='s2s' branches and recons_type='logM' run and produce
    finite losses."""
    from scgib_tpu.graph.transition import (pack_logm_targets,
                                            transition_logm)
    from scgib_tpu.models.scgib import PretrainModel

    graphs = random_dataset(3, seed=29, min_nodes=5, max_nodes=8,
                            feat_dim=FEAT)
    egos = [extract_egonets(g, 1) for g in graphs]
    g = pack_graphs(graphs, 32, 128, 4)
    sub = pack_subgraphs(graphs, egos, 128, 512)
    logms = [transition_logm(gr, 2) for gr in graphs]
    T, W = pack_logm_targets(graphs, logms, 32, 2)

    model = PretrainModel(in_dim=FEAT, hidden=8, d_transfer=4,
                          readout="s2s", recons_type="logM",
                          k_transition=2)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g, sub, logm_targets=jnp.asarray(T), logm_weights=jnp.asarray(W),
        train=True)
    losses, _ = model.apply(variables, g, sub,
                            logm_targets=jnp.asarray(T),
                            logm_weights=jnp.asarray(W), train=True,
                            mutable=["batch_stats"],
                            rngs={"noise": jax.random.PRNGKey(2)})
    assert np.isfinite(float(losses.total))
    assert float(losses.reconstruction) > 0


def test_gcn_sage_banded_matches_coo():
    """GCN / GraphSAGE banded fast paths == COO gather paths (value+grad)."""
    import jax
    import jax.numpy as jnp

    from scgib_tpu.data.synthetic import random_dataset
    from scgib_tpu.graph.batching import pack_graphs
    from scgib_tpu.models.encoders import GCN, GraphSAGE

    graphs = random_dataset(16, seed=5, min_nodes=6, max_nodes=20,
                            feat_dim=8)
    g = pack_graphs(graphs, 512, 2048, 16, banded=True)
    assert g.band_blocks is not None
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(512, 8)).astype(np.float32))

    for cls in (GCN, GraphSAGE):
        mod = cls(hidden=16)
        v = mod.init(jax.random.PRNGKey(0), x, g.senders, g.receivers,
                     node_mask=g.node_mask, edge_mask=g.edge_mask)

        def run(xx, band):
            return mod.apply(v, xx, g.senders, g.receivers,
                             node_mask=g.node_mask, edge_mask=g.edge_mask,
                             band=band)

        band = (g.band_blocks, g.band_col_off)
        out_c = run(x, None)
        out_b = run(x, band)
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_c),
                                   rtol=2e-5, atol=2e-5)
        g_c = jax.grad(lambda xx: jnp.sum(run(xx, None) ** 2))(x)
        g_b = jax.grad(lambda xx: jnp.sum(run(xx, band) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_c),
                                   rtol=2e-4, atol=2e-4)
