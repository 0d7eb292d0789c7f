"""Structured synthetic corpus + planted-arrangement transfer probe
(VERDICT r4: the random-feature corpus made pretraining unlearnable and
the ring probe had no headroom — these generators are the fix)."""

import numpy as np

from scgib_tpu.data.synthetic import (probe_dataset, structured_dataset,
                                      structured_molecule,
                                      _structure_descriptors)


def test_structured_features_correlate_with_structure():
    """The informative channels must track the structural descriptors
    (that correlation is what the bottleneck compresses)."""
    rng = np.random.default_rng(0)
    hits_deg = hits_ring = total = 0
    for _ in range(50):
        g, t = structured_molecule(rng, feat_flip=0.0, type_flip=0.0)
        deg, in_ring = _structure_descriptors(
            g.num_nodes, g.senders, g.receivers)
        # noise-free observation: channels equal the descriptors exactly
        np.testing.assert_array_equal(g.node_feat[:, 1],
                                      np.minimum(deg, 6))
        np.testing.assert_array_equal(g.node_feat[:, 2],
                                      in_ring.astype(np.float32))
        np.testing.assert_array_equal(
            g.node_feat[:, 0], 4 * in_ring + np.minimum(deg, 3))
        hits_deg += 1
        total += g.num_nodes
        hits_ring += int(in_ring.sum())
    assert hits_ring > 0.05 * total  # rings actually occur


def test_structured_determinism_and_shape():
    a = structured_dataset(20, seed=7)
    b = structured_dataset(20, seed=7)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.node_feat, y.node_feat)
        np.testing.assert_array_equal(x.senders, y.senders)
    assert all(g.node_feat.shape[1] == 9 for g in a)
    c = structured_dataset(5, seed=7, feat_dim=11)
    assert all(g.node_feat.shape[1] == 11 for g in c)


def test_probe_balanced_and_deterministic():
    pd = probe_dataset(200, seed=3)
    y = np.array([float(g.label[0]) for g in pd])
    assert 0.35 < y.mean() < 0.65
    pd2 = probe_dataset(200, seed=3)
    for a, b in zip(pd, pd2):
        np.testing.assert_array_equal(a.node_feat, b.node_feat)
        assert float(a.label[0]) == float(b.label[0])


def test_probe_no_pooled_leak_but_relational_signal():
    """The planted-arrangement label must be invisible to pooled
    first-order statistics (the round-4 count-threshold probe leaked at
    AUC 0.89) while a relational read of (odd type adjacent to ring)
    separates it."""
    from scgib_tpu.utils.metrics import eval_rocauc

    pd = probe_dataset(600, seed=1)
    y = np.array([float(g.label[0]) for g in pd])

    # pooled score: sum of all channels (any fixed linear functional of
    # the pooled features has the same null behavior)
    pooled = np.array([g.node_feat.sum() + g.num_nodes + g.num_edges
                       for g in pd])
    auc_pooled = eval_rocauc(y[:, None], pooled[:, None])["rocauc"]
    assert abs(auc_pooled - 0.5) < 0.08

    rel = []
    for g in pd:
        f = g.node_feat
        obs_ring = f[:, 2] > 0.5
        both = ((f[:, 0] % 2) == 1) & (f[:, 5] > 0.5)
        nb_ring = np.zeros(g.num_nodes, bool)
        nb_ring[g.receivers[obs_ring[g.senders]]] = True
        rel.append(float((both & nb_ring & ~obs_ring).sum()))
    auc_rel = eval_rocauc(y[:, None], np.asarray(rel)[:, None])["rocauc"]
    assert auc_rel > 0.75


def test_triangle_probe_dataset():
    """Triangle-density probe: deterministic, balanced, topology-labeled."""
    from scgib_tpu.data.synthetic import triangle_probe_dataset

    ds = triangle_probe_dataset(80, seed=3)
    labels = np.array([float(g.label[0]) for g in ds])
    # median split: both classes well represented
    assert 0.3 <= labels.mean() <= 0.7
    # deterministic
    ds2 = triangle_probe_dataset(80, seed=3)
    assert all(np.array_equal(a.node_feat, b.node_feat)
               and float(a.label[0]) == float(b.label[0])
               for a, b in zip(ds, ds2))
    # labels really track triangle count
    for g in ds[:10]:
        n = g.num_nodes
        A = np.zeros((n, n))
        A[g.senders, g.receivers] = 1.0
        t = np.trace(A @ A @ A) / 6.0
        assert t >= 0
