"""Native C++ host library vs the NumPy reference implementation."""

import time

import numpy as np
import pytest

from scgib_tpu import native
from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.egonet import extract_egonets

pytestmark = pytest.mark.skipif(not native.have_native(),
                                reason="native library unavailable "
                                       "(no g++?)")


@pytest.mark.parametrize("k", [1, 2, 3])
def test_egonets_match_numpy(k):
    graphs = random_dataset(20, seed=13, min_nodes=4, max_nodes=24)
    got = native.extract_egonets_batch(graphs, k)
    want = [extract_egonets(g, k) for g in graphs]
    for e1, e2 in zip(got, want):
        assert len(e1.node_lists) == len(e2.node_lists)
        for nl1, nl2 in zip(e1.node_lists, e2.node_lists):
            np.testing.assert_array_equal(nl1, nl2)
        for (s1, r1), (s2, r2) in zip(e1.edge_lists, e2.edge_lists):
            np.testing.assert_array_equal(s1, s2)
            np.testing.assert_array_equal(r1, r2)


def test_egonets_single_node_graph():
    from scgib_tpu.graph.batching import GraphData

    g = GraphData(senders=np.zeros(0, np.int32),
                  receivers=np.zeros(0, np.int32),
                  node_feat=np.ones((1, 3), np.float32))
    egos = native.extract_egonets_batch([g], 1)
    assert len(egos[0].node_lists) == 1
    np.testing.assert_array_equal(egos[0].node_lists[0], [0])
    assert len(egos[0].edge_lists[0][0]) == 0


def test_gather_rows():
    rng = np.random.default_rng(7)
    feat = rng.normal(size=(50, 9)).astype(np.float32)
    idx = rng.integers(0, 50, size=200).astype(np.int32)
    np.testing.assert_array_equal(native.gather_rows(feat, idx), feat[idx])


def test_native_speedup():
    """The threaded C++ extraction should beat NumPy comfortably on a
    large-ish workload (soft check: at least parity; prints the ratio)."""
    graphs = random_dataset(300, seed=5, min_nodes=10, max_nodes=30)
    t0 = time.perf_counter()
    native.extract_egonets_batch(graphs, 2)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for g in graphs:
        extract_egonets(g, 2)
    t_numpy = time.perf_counter() - t0
    print(f"egonet extraction: native {t_native*1e3:.1f}ms "
          f"numpy {t_numpy*1e3:.1f}ms ({t_numpy/t_native:.1f}x)")
    # soft perf check; generous bound because CI runs under CPU
    # contention (typical solo ratio ~4x in native's favor)
    assert t_native < t_numpy * 3.0
