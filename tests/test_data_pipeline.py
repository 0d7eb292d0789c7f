"""Data pipeline: loader capacities, batch iteration, cache round-trip,
splits, transition matrices."""

import numpy as np
import pytest

from scgib_tpu.data.cache import load_dataset, save_dataset
from scgib_tpu.data.loader import (GraphDataset, batch_iterator,
                                   plan_capacities)
from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.batching import BucketSpec
from scgib_tpu.graph.transition import pack_logm_targets, transition_logm


@pytest.fixture(scope="module")
def ds():
    return GraphDataset(random_dataset(40, seed=5, num_tasks=3,
                                       label_nan_frac=0.2), k=1)


def test_plan_capacities_fit(ds):
    caps = plan_capacities(ds, batch_size=8)
    batches = list(batch_iterator(ds, 8, caps, shuffle=True, seed=0))
    total = 0
    for g, sub in batches:
        total += int(np.asarray(g.graph_mask).sum())
        assert g.node_feat.shape[0] == caps.nodes
        assert sub.node_feat is None   # derived on device
        assert sub.node_mask.shape[0] == caps.sub_nodes
    assert total == len(ds)


def test_batch_iterator_deterministic(ds):
    caps = plan_capacities(ds, batch_size=8)
    a = [np.asarray(g.node_feat).sum()
         for g, _ in batch_iterator(ds, 8, caps, seed=3)]
    b = [np.asarray(g.node_feat).sum()
         for g, _ in batch_iterator(ds, 8, caps, seed=3)]
    assert a == b
    c = [np.asarray(g.node_feat).sum()
         for g, _ in batch_iterator(ds, 8, caps, seed=4)]
    assert a != c


def test_cache_roundtrip(tmp_path, ds):
    path = str(tmp_path / "cache.npz")
    save_dataset(path, ds)
    back = load_dataset(path)
    assert len(back) == len(ds)
    assert back.k == ds.k
    for g1, g2 in zip(ds.graphs, back.graphs):
        np.testing.assert_array_equal(g1.senders, g2.senders)
        np.testing.assert_array_equal(g1.node_feat, g2.node_feat)
        np.testing.assert_allclose(g1.label, g2.label)
    for e1, e2 in zip(ds.egonets, back.egonets):
        for nl1, nl2 in zip(e1.node_lists, e2.node_lists):
            np.testing.assert_array_equal(nl1, nl2)
        for (s1, r1), (s2, r2) in zip(e1.edge_lists, e2.edge_lists):
            np.testing.assert_array_equal(s1, s2)
            np.testing.assert_array_equal(r1, r2)


def test_split(ds):
    tr, va, te = ds.split(20, 10, shuffle_seed=7)
    assert len(tr) == 20 and len(va) == 10 and len(te) == 10
    # shuffle determinism
    tr2, _, _ = ds.split(20, 10, shuffle_seed=7)
    np.testing.assert_array_equal(tr.graphs[0].node_feat,
                                  tr2.graphs[0].node_feat)


def test_transition_logm_properties():
    g = random_dataset(1, seed=9)[0]
    logms = transition_logm(g, 3)
    assert len(logms) == 3
    for lm in logms:
        assert lm.shape == (g.num_nodes, g.num_nodes)
        assert np.all(lm >= 0)
        assert np.all(np.isfinite(lm))
    # pack targets
    graphs = random_dataset(3, seed=10)
    lms = [transition_logm(gr, 2) for gr in graphs]
    n_total = sum(gr.num_nodes for gr in graphs)
    T, W = pack_logm_targets(graphs, lms, n_total + 5, 2)
    assert T.shape == (2, n_total + 5, n_total + 5)
    off = 0
    for gr, lm in zip(graphs, lms):
        n = gr.num_nodes
        np.testing.assert_array_equal(T[0, off:off + n, off:off + n], lm[0])
        np.testing.assert_allclose(W[off:off + n, off:off + n],
                                   1.0 / (n * n))
        off += n
    assert np.all(W[n_total:, :] == 0)


def test_transition_logm_batched_parity():
    """Device-batched logM (one MXU matmul chain per chunk) must match the
    per-graph NumPy reference path exactly within f32."""
    from scgib_tpu.graph.transition import transition_logm_batched

    graphs = random_dataset(50, seed=11)
    k = 3
    ref = [transition_logm(g, k) for g in graphs]
    got = transition_logm_batched(graphs, k, chunk=16)
    assert len(got) == len(graphs)
    for r, b, g in zip(ref, got, graphs):
        assert len(b) == k
        for i in range(k):
            assert b[i].shape == (g.num_nodes, g.num_nodes)
            np.testing.assert_allclose(b[i], r[i], rtol=1e-5, atol=1e-5)


def test_dataset_logms_uses_batched_path():
    dsl = GraphDataset(random_dataset(40, seed=12), k=1)
    lms = dsl.logms(2)
    ref = [transition_logm(g, 2) for g in dsl.graphs]
    for got, want in zip(lms, ref):
        np.testing.assert_allclose(got[1], want[1], rtol=1e-5, atol=1e-5)


def test_background_iter_propagates_and_orders():
    from scgib_tpu.data.loader import background_iter

    assert list(background_iter(iter(range(50)), size=4)) == list(range(50))

    def boom():
        yield 1
        raise ValueError("producer died")

    import pytest
    it = background_iter(boom(), size=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="producer died"):
        list(it)


def test_prefetch_host_stage_matches_plain():
    import jax
    from scgib_tpu.data.loader import prefetch_to_device

    items = [np.arange(10) * i for i in range(8)]
    got_plain = [np.asarray(x) for x in
                 prefetch_to_device(iter(items), size=2)]
    got_staged = [np.asarray(x) for x in
                  prefetch_to_device(iter(items), size=2, host_stage=2)]
    for a, b, c in zip(items, got_plain, got_staged):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, c)
