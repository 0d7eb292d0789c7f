"""Compact wire format: lossless roundtrip + training-path equivalence.

graph/wire.py compresses packed batches for host->device transfer (int16
indices, count scalars instead of masks, int8 categorical features, and
a single-buffer byte transport).  Everything must reconstruct EXACTLY —
the wire path is a transport optimization, never a numerics change.
"""

import jax
import jax.numpy as jnp
import numpy as np

from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.batching import pack_graphs, pack_subgraphs
from scgib_tpu.graph.egonet import extract_egonets
from scgib_tpu.graph.wire import (byte_spec_of, from_wire_graph,
                                  from_wire_sub, pack_bytes, to_wire_graph,
                                  to_wire_sub, unpack_bytes)
from scgib_tpu.models.scgib import PretrainModel
from scgib_tpu.train.trainer import (TrainState, adam_l2,
                                     make_pretrain_superbatch_step)


def _batch(n_graphs=8, seed=0, labels=False):
    graphs = random_dataset(n_graphs, seed=seed, min_nodes=6, max_nodes=12,
                            feat_dim=9, num_tasks=3 if labels else None,
                            label_nan_frac=0.2 if labels else 0.0)
    egos = [extract_egonets(g, 1) for g in graphs]
    g = pack_graphs(graphs, 128, 512, n_graphs)
    sub = pack_subgraphs(graphs, egos, 512, 2048)
    return g, sub


def _assert_tree_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_wire_roundtrip_exact():
    g, sub = _batch(labels=True)
    g2 = jax.jit(from_wire_graph)(jax.device_put(to_wire_graph(g)))
    sub2 = jax.jit(from_wire_sub)(jax.device_put(to_wire_sub(sub)))
    _assert_tree_equal(g2, g)
    # sub roundtrip: node_feat stays None on both sides
    assert sub2.node_feat is None and sub.node_feat is None
    _assert_tree_equal(
        (sub2.node_center, sub2.node_orig, sub2.node_mask, sub2.senders,
         sub2.receivers, sub2.edge_mask),
        (sub.node_center, sub.node_orig, sub.node_mask, sub.senders,
         sub.receivers, sub.edge_mask))


def test_wire_feature_compression_is_exact_or_skipped():
    """Integral features ship int8; non-integral stay float32."""
    g, _ = _batch()
    w = to_wire_graph(g)
    assert np.asarray(w.node_feat).dtype == np.int8   # synthetic ints
    g_f = g.replace(node_feat=g.node_feat + 0.5)
    w_f = to_wire_graph(g_f)
    assert np.asarray(w_f.node_feat).dtype == np.float32


def test_byte_transport_roundtrip():
    g, sub = _batch(seed=3)
    wires = (to_wire_graph(g), to_wire_sub(sub))
    spec = byte_spec_of(wires)
    buf = pack_bytes(wires, spec)
    assert buf.dtype == np.uint8
    out = jax.jit(lambda b: unpack_bytes(b, spec))(buf)
    _assert_tree_equal(out, wires)


def test_wire_superbatch_step_matches_plain():
    """The byte-transport superbatch step produces EXACTLY the same losses
    and parameters as the plain superbatch step on the same batches."""
    K = 4
    batches = [_batch(seed=s) for s in range(K)]
    model = PretrainModel(in_dim=9, hidden=16, d_transfer=8,
                          deterministic=True)
    g0, sub0 = batches[0]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g0, sub0, train=True)
    tx = adam_l2(1e-3)

    stack = lambda xs: jax.tree_util.tree_map(
        lambda *ls: np.stack([np.asarray(l) for l in ls]), *xs)
    gs = stack([b[0] for b in batches])
    subs = stack([b[1] for b in batches])
    plain = make_pretrain_superbatch_step(model, tx, donate=False)
    st_a, losses_a = plain(TrainState.create(variables, tx), gs, subs,
                           jax.random.PRNGKey(9))

    wires = [(to_wire_graph(b[0]), to_wire_sub(b[1])) for b in batches]
    wgs = stack([w[0] for w in wires])
    wsubs = stack([w[1] for w in wires])
    g_spec = byte_spec_of(wgs)
    s_spec = byte_spec_of(wsubs)
    bstep = make_pretrain_superbatch_step(model, tx, donate=False,
                                          byte_specs=(g_spec, s_spec))
    st_b, losses_b = bstep(TrainState.create(variables, tx),
                           pack_bytes(wgs, g_spec),
                           pack_bytes(wsubs, s_spec),
                           jax.random.PRNGKey(9))

    np.testing.assert_allclose(np.asarray(losses_a.total),
                               np.asarray(losses_b.total), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st_a.params),
                    jax.tree_util.tree_leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def _assert_masked_batch_equal(a, b):
    """Batches agree on every REAL entry and every mask; padded index
    values may differ (compact wire re-encodes padding as self-loops on
    the last real row — consumers weight by the masks)."""
    np.testing.assert_array_equal(np.asarray(a.node_mask),
                                  np.asarray(b.node_mask))
    np.testing.assert_array_equal(np.asarray(a.edge_mask),
                                  np.asarray(b.edge_mask))
    em = np.asarray(a.edge_mask)
    np.testing.assert_array_equal(np.asarray(a.senders)[em],
                                  np.asarray(b.senders)[em])
    np.testing.assert_array_equal(np.asarray(a.receivers)[em],
                                  np.asarray(b.receivers)[em])


def test_wire_compact_roundtrip():
    g, sub = _batch(seed=5, labels=True)
    g2 = jax.jit(from_wire_graph)(
        jax.device_put(to_wire_graph(g, compact=True)))
    sub2 = jax.jit(from_wire_sub)(
        jax.device_put(to_wire_sub(sub, compact=True)))
    _assert_masked_batch_equal(g2, g)
    _assert_masked_batch_equal(sub2, sub)
    np.testing.assert_array_equal(np.asarray(g2.node_feat),
                                  np.asarray(g.node_feat))
    nm = np.asarray(sub.node_mask)
    np.testing.assert_array_equal(np.asarray(sub2.node_center)[nm],
                                  np.asarray(sub.node_center)[nm])
    np.testing.assert_array_equal(np.asarray(sub2.node_orig)[nm],
                                  np.asarray(sub.node_orig)[nm])
    # padded index values must stay in range (consumers only mask, the
    # gathers still execute)
    n_cap = np.asarray(g.node_mask).shape[0]
    for arr in (g2.senders, g2.receivers):
        a = np.asarray(arr)
        assert a.min() >= 0 and a.max() < n_cap
    s_cap = nm.shape[0]
    for arr in (sub2.senders, sub2.receivers):
        a = np.asarray(arr)
        assert a.min() >= 0 and a.max() < s_cap
    assert np.asarray(sub2.node_orig).max() < n_cap
    # compact halves the edge wire: 2 bytes/edge vs 4
    w = to_wire_graph(g, compact=True)
    assert np.asarray(w.edge_rdelta).dtype == np.uint8
    assert np.asarray(w.edge_soff).dtype == np.int8
    assert w.senders is None and w.receivers is None


def test_wire_compact_overflow_raises():
    from scgib_tpu.graph.wire import CompactOverflow

    graphs = random_dataset(2, seed=1, min_nodes=150, max_nodes=180,
                            feat_dim=9)
    egos = [extract_egonets(g, 1) for g in graphs]
    g = pack_graphs(graphs, 512, 4096, 2)
    try:
        to_wire_graph(g, compact=True)
    except CompactOverflow:
        return
    raise AssertionError("expected CompactOverflow for 150+-node graphs")


def test_wire_combined_compact_superbatch_matches_plain():
    """ONE combined compact byte buffer per superbatch: same losses and
    parameters as the plain (unwired) superbatch step."""
    K = 4
    batches = [_batch(seed=s) for s in range(K)]
    model = PretrainModel(in_dim=9, hidden=16, d_transfer=8,
                          deterministic=True)
    g0, sub0 = batches[0]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g0, sub0, train=True)
    tx = adam_l2(1e-3)

    stack = lambda xs: jax.tree_util.tree_map(
        lambda *ls: np.stack([np.asarray(l) for l in ls]), *xs)
    gs = stack([b[0] for b in batches])
    subs = stack([b[1] for b in batches])
    plain = make_pretrain_superbatch_step(model, tx, donate=False)
    st_a, losses_a = plain(TrainState.create(variables, tx), gs, subs,
                           jax.random.PRNGKey(9))

    wires = [(to_wire_graph(b[0], compact=True),
              to_wire_sub(b[1], compact=True)) for b in batches]
    tree = (stack([w[0] for w in wires]), stack([w[1] for w in wires]))
    spec = byte_spec_of(tree)
    bstep = make_pretrain_superbatch_step(model, tx, donate=False,
                                          byte_spec=spec)
    st_b, losses_b = bstep(TrainState.create(variables, tx),
                           pack_bytes(tree, spec), jax.random.PRNGKey(9))

    np.testing.assert_allclose(np.asarray(losses_a.total),
                               np.asarray(losses_b.total), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st_a.params),
                    jax.tree_util.tree_leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_wire_compact_ok_detection():
    from scgib_tpu.data.loader import GraphDataset, wire_compact_ok

    small = GraphDataset(random_dataset(6, seed=0, min_nodes=6,
                                        max_nodes=12, feat_dim=9), k=1)
    assert wire_compact_ok(small)
    big = GraphDataset(random_dataset(2, seed=1, min_nodes=150,
                                      max_nodes=180, feat_dim=9), k=1)
    assert not wire_compact_ok(big)


def test_wire_compact_ok_rejects_edgeless_graphs():
    """A graph with no edges makes the compact receiver-delta gap
    unbounded across batch arrangements — wire_compact_ok must refuse."""
    from scgib_tpu.data.loader import GraphDataset, wire_compact_ok
    from scgib_tpu.graph.batching import GraphData

    ok = GraphData(senders=np.asarray([0, 1], np.int32),
                   receivers=np.asarray([1, 0], np.int32),
                   node_feat=np.zeros((2, 9), np.float32))
    lone = GraphData(senders=np.zeros(0, np.int32),
                     receivers=np.zeros(0, np.int32),
                     node_feat=np.zeros((3, 9), np.float32))
    assert wire_compact_ok(GraphDataset([ok, ok], k=1))
    assert not wire_compact_ok(GraphDataset([ok, lone, ok], k=1))


def test_wire_compact_roundtrip_many_shapes():
    """Compact wire roundtrip across many random datasets/capacities:
    every real index reconstructs exactly and all padded indices stay in
    range."""
    from scgib_tpu.data.loader import (GraphDataset, batch_iterator,
                                      plan_capacities, wire_compact_ok)

    for seed, (lo, hi) in [(0, (4, 10)), (1, (10, 30)), (2, (25, 33))]:
        ds = GraphDataset(random_dataset(40, seed=seed, min_nodes=lo,
                                         max_nodes=hi, feat_dim=9), k=1)
        assert wire_compact_ok(ds)
        caps = plan_capacities(ds, 16)
        for g, sub in batch_iterator(ds, 16, caps, shuffle=True,
                                     seed=seed):
            g2 = jax.jit(from_wire_graph)(to_wire_graph(g, compact=True))
            s2 = jax.jit(from_wire_sub)(to_wire_sub(sub, compact=True))
            _assert_masked_batch_equal(g2, g)
            _assert_masked_batch_equal(s2, sub)
            for arr, cap in ((g2.senders, g.node_feat.shape[0]),
                             (g2.receivers, g.node_feat.shape[0]),
                             (s2.senders, sub.node_center.shape[0]),
                             (s2.receivers, sub.node_center.shape[0]),
                             (s2.node_orig, g.node_feat.shape[0])):
                a = np.asarray(arr)
                assert a.min() >= 0 and a.max() < cap


def test_gt_band_fits_boundary():
    """(64, 128) GT geometry fits exactly up to 33-node components."""
    from scgib_tpu.graph.banded import gt_band_fits

    assert gt_band_fits(33, 4096)
    assert not gt_band_fits(34, 4096)
    assert not gt_band_fits(10, 100)        # cap not a tile multiple
    assert not gt_band_fits(10, 64)         # cap below one band


def test_pack_bytes_grouped_matches_stacked():
    """pack_bytes_grouped (direct per-batch writes into the combined
    buffer — the sustained loop's fast path) is byte-identical to
    stacking the group and running pack_bytes."""
    from scgib_tpu.data.loader import (GraphDataset, _stack_group,
                                       batch_iterator, plan_capacities)
    from scgib_tpu.data.synthetic import random_dataset
    from scgib_tpu.graph.wire import (byte_spec_of, pack_bytes,
                                      pack_bytes_grouped, to_wire_graph,
                                      to_wire_sub)

    ds = GraphDataset(random_dataset(64, seed=11, min_nodes=6,
                                     max_nodes=20, feat_dim=9), k=1)
    caps = plan_capacities(ds, 16)
    wires = [(to_wire_graph(g, compact=True), to_wire_sub(s, compact=True))
             for g, s in batch_iterator(ds, 16, caps, shuffle=False)][:4]
    tree = _stack_group(wires)
    spec = byte_spec_of(tree)
    assert np.array_equal(pack_bytes(tree, spec),
                          pack_bytes_grouped(wires, spec))
