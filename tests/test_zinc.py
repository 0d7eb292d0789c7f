"""ZINC (benchmarking-gnns pickle format) reader tests — C19 parity.

The reference's MoleculeDGL (molecules.py:18-94) reads <split>.pickle
records {num_atom, atom_type, bond_type, logP_SA_cycle_normalized} and
optionally applies the <split>.index 10k/1k/1k subset.  We synthesize
pickles in both torch-tensor and NumPy form and check edge extraction,
one-hot features, labels, and index subsetting.
"""

import csv
import os
import pickle

import numpy as np
import pytest

from scgib_tpu.data.zinc import (NUM_ATOM_TYPES, load_zinc,
                                 molecule_to_graph)


def _make_mol(rng, n, torch_tensors=False):
    atom = rng.integers(0, NUM_ATOM_TYPES, size=n)
    adj = np.zeros((n, n), dtype=np.int64)
    # random symmetric bond-type matrix over a ring (connected)
    for i in range(n):
        j = (i + 1) % n
        b = int(rng.integers(1, 4))
        adj[i, j] = b
        adj[j, i] = b
    label = float(rng.normal())
    mol = {"num_atom": n, "atom_type": atom, "bond_type": adj,
           "logP_SA_cycle_normalized": np.float32(label)}
    if torch_tensors:
        torch = pytest.importorskip("torch")
        mol = {"num_atom": n,
               "atom_type": torch.from_numpy(atom),
               "bond_type": torch.from_numpy(adj),
               "logP_SA_cycle_normalized": torch.tensor(label)}
    return mol, label


@pytest.mark.parametrize("torch_tensors", [False, True])
def test_molecule_to_graph(torch_tensors):
    rng = np.random.default_rng(0)
    mol, label = _make_mol(rng, 7, torch_tensors)
    g, bond = molecule_to_graph(mol)
    assert g.num_nodes == 7
    # ring: 7 undirected bonds = 14 directed edges
    assert g.num_edges == 14
    assert bond.shape == (14,)
    assert (bond >= 1).all() and (bond <= 3).all()
    # one-hot features
    assert g.node_feat.shape == (7, NUM_ATOM_TYPES)
    np.testing.assert_allclose(g.node_feat.sum(axis=1), 1.0)
    np.testing.assert_allclose(g.label, [label], rtol=1e-6)
    # symmetric edge list
    es = set(zip(g.senders.tolist(), g.receivers.tolist()))
    assert all((b, a) in es for a, b in es)


def test_load_zinc_split_and_index(tmp_path):
    rng = np.random.default_rng(1)
    mols = [_make_mol(rng, int(rng.integers(4, 12)))[0] for _ in range(20)]
    with open(tmp_path / "val.pickle", "wb") as f:
        pickle.dump(mols, f)

    # without an index file: full order
    graphs = load_zinc(str(tmp_path), "val")
    assert len(graphs) == 20

    # index file selects a subset in the given order (molecules.py:27-33)
    keep = [3, 0, 7, 12, 19]
    with open(tmp_path / "val.index", "w", newline="") as f:
        csv.writer(f).writerow(keep)
    graphs_sub = load_zinc(str(tmp_path), "val")
    assert len(graphs_sub) == 5
    for gi, orig in zip(graphs_sub, keep):
        assert gi.num_nodes == graphs[orig].num_nodes
        np.testing.assert_array_equal(gi.node_feat, graphs[orig].node_feat)

    # subset=False ignores the index
    assert len(load_zinc(str(tmp_path), "val", subset=False)) == 20
    # limit
    assert len(load_zinc(str(tmp_path), "val", subset=False, limit=3)) == 3


def test_load_zinc_packs_and_trains():
    """ZINC graphs flow through the standard packer + model."""
    import jax

    from scgib_tpu.graph.batching import pack_graphs, pack_subgraphs
    from scgib_tpu.graph.egonet import extract_egonets
    from scgib_tpu.models.scgib import FinetuneModel

    rng = np.random.default_rng(2)
    graphs = [_make_mol(rng, int(rng.integers(5, 10)))[0] for _ in range(4)]
    gds = [molecule_to_graph(m)[0] for m in graphs]
    egos = [extract_egonets(g, 1) for g in gds]
    g = pack_graphs(gds, 64, 256, 4)
    sub = pack_subgraphs(gds, egos, 256, 1024)
    model = FinetuneModel(in_dim=NUM_ATOM_TYPES, num_out=1, hidden=16,
                          d_transfer=8, regression=True)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "noise": jax.random.PRNGKey(1)}, g, sub,
                           train=False)
    out = model.apply(variables, g, sub, train=False,
                      rngs={"noise": jax.random.PRNGKey(2)})
    assert out.shape == (g.num_graphs, 1)
    assert np.isfinite(np.asarray(out)).all()
