"""SMILES parser / featurizer / dataset-reader tests.

Goldens are hand-derived chemistry facts (molecular formulas, ring
membership, valences) — RDKit is unavailable, so correctness is pinned to
textbook values for well-known molecules instead of library parity.
"""

import gzip
import os

import numpy as np
import pytest

from scgib_tpu.data.molnet import (load_moleculenet, load_ogb_graphs,
                                   load_smiles_csv)
from scgib_tpu.data.smiles import (SmilesError, atom_features_ogb,
                                   featurize, parse_smiles, smiles_to_graph)


def formula(smiles):
    return parse_smiles(smiles).formula()


def test_benzene():
    mol = parse_smiles("c1ccccc1")
    assert mol.num_atoms == 6
    assert len(mol.bonds) == 6
    assert formula("c1ccccc1") == {"C": 6, "H": 6}
    for a in mol.atoms:
        assert a.aromatic and a.in_ring and a.num_h == 1
        assert a.degree_total == 3 and a.hybridization == "SP2"
    for b in mol.bonds:
        assert b.aromatic and b.in_ring


def test_known_formulas():
    # textbook molecular formulas
    assert formula("CC(=O)Oc1ccccc1C(=O)O") == {"C": 9, "H": 8, "O": 4}
    assert formula("Cn1cnc2c1c(=O)n(C)c(=O)n2C") == \
        {"C": 8, "H": 10, "N": 4, "O": 2}                       # caffeine
    assert formula("CCO") == {"C": 2, "H": 6, "O": 1}           # ethanol
    assert formula("C#N") == {"C": 1, "N": 1, "H": 1}           # HCN
    assert formula("O=C=O") == {"C": 1, "O": 2}                 # CO2
    assert formula("c1ccc2ccccc2c1") == {"C": 10, "H": 8}       # naphthalene
    assert formula("C1CCCCC1") == {"C": 6, "H": 12}             # cyclohexane
    assert formula("NC(=O)c1ccncc1") == \
        {"C": 6, "H": 6, "N": 2, "O": 1}                        # isonicotinamide
    assert formula("OS(=O)(=O)O") == {"S": 1, "O": 4, "H": 2}   # H2SO4


def test_charges_and_explicit_h():
    mol = parse_smiles("[NH4+]")
    a = mol.atoms[0]
    assert a.charge == 1 and a.num_h == 4 and a.radical == 0
    mol = parse_smiles("C(=O)[O-]")
    o = mol.atoms[2]
    assert o.charge == -1 and o.num_h == 0 and o.radical == 0
    assert parse_smiles("[Fe+2]").atoms[0].charge == 2
    assert parse_smiles("[O--]").atoms[0].charge == -2
    # methyl radical
    assert parse_smiles("[CH3]").atoms[0].radical == 1


def test_ring_membership_and_bridges():
    mol = parse_smiles("c1ccccc1CC")   # toluene + extra C: tail not in ring
    assert [a.in_ring for a in mol.atoms] == [True] * 6 + [False] * 2
    # the ring-to-tail bond is a bridge
    ring_bonds = [b for b in mol.bonds if b.in_ring]
    assert len(ring_bonds) == 6
    # spiro: both rings detected
    mol = parse_smiles("C1CCC2(CC1)CCCC2")
    assert all(a.in_ring for a in mol.atoms)


def test_branches_rings_percent():
    mol = parse_smiles("C%10CCCCC%10")      # %nn ring closure
    assert len(mol.bonds) == 6
    mol = parse_smiles("CC(C)(C)C")         # neopentane branches
    assert mol.atoms[1].degree_heavy == 4
    mol = parse_smiles("[Na+].[Cl-]")       # disconnected parts
    assert len(mol.bonds) == 0 and mol.num_atoms == 2


def test_bond_orders_and_hybridization():
    mol = parse_smiles("C=CC#N")
    assert mol.bonds[0].order == 2.0 and mol.bonds[2].order == 3.0
    hyb = [a.hybridization for a in mol.atoms]
    assert hyb == ["SP2", "SP2", "SP", "SP"]
    # allene center is SP
    assert parse_smiles("C=C=C").atoms[1].hybridization == "SP"
    # SF6 -> SP3D2
    assert parse_smiles("FS(F)(F)(F)(F)F").atoms[1].hybridization == "SP3D2"


def test_chirality_tags():
    mol = parse_smiles("N[C@@H](C)C(=O)O")   # L-alanine
    assert mol.atoms[1].chirality == "CHI_TETRAHEDRAL_CW"
    assert mol.atoms[1].num_h == 1
    assert parse_smiles("[C@H](N)(C)O").atoms[0].chirality == \
        "CHI_TETRAHEDRAL_CCW"


def test_ogb_feature_vector_benzene():
    mol = parse_smiles("c1ccccc1")
    f = atom_features_ogb(mol.atoms[0])
    # [Z-1, chirality, total degree, charge+5, numH, radical, hyb, arom, ring]
    assert f == [5, 0, 3, 5, 1, 0, 1, 1, 1]


def test_ogb_feature_vector_ethanol_oxygen():
    mol = parse_smiles("CCO")
    f = atom_features_ogb(mol.atoms[2])
    assert f == [7, 0, 2, 5, 1, 0, 2, 0, 0]   # O: deg 2 (1 C + 1 H), SP3


def test_featurize_shapes_and_symmetry():
    g = smiles_to_graph("CC(=O)Oc1ccccc1C(=O)O")
    assert g.node_feat.shape == (13, 9)
    # symmetrized: every edge has its reverse
    pairs = set(zip(g.senders.tolist(), g.receivers.tolist()))
    assert all((r, s) in pairs for s, r in pairs)
    assert g.num_edges == 2 * 13  # 13 bonds (12 skeleton + 1 ring closure)


def test_parse_errors():
    for bad in ("C1CC", "C(", "c1ccccc1)", "[Xx]", "Q"):
        with pytest.raises(SmilesError):
            parse_smiles(bad)


def test_pyg_scheme_differs_but_shapes_match():
    x_ogb, s, r = featurize(parse_smiles("c1ccncc1"), scheme="ogb")
    x_pyg, _, _ = featurize(parse_smiles("c1ccncc1"), scheme="pyg")
    assert x_ogb.shape == x_pyg.shape == (6, 9)
    # PyG atomic_num is raw Z, OGB is Z-1
    assert (x_pyg[:, 0] - x_ogb[:, 0] == 1).all()


# ---------------------------------------------------------------------------
# dataset readers
# ---------------------------------------------------------------------------

def test_load_smiles_csv(tmp_path):
    p = tmp_path / "toy.csv"
    p.write_text("smiles,act,extra\n"
                 "CCO,1,9\n"
                 "c1ccccc1,0,8\n"
                 "NOT_A_SMILES((,1,7\n"
                 "CC(=O)O,,6\n")
    graphs, skipped = load_smiles_csv(str(p), label_cols=["act"])
    assert len(graphs) == 3 and len(skipped) == 1
    assert graphs[0].label.tolist() == [1.0]
    assert np.isnan(graphs[2].label[0])      # empty cell -> NaN (multi-task)


def test_load_smiles_csv_gz_and_slice(tmp_path):
    p = tmp_path / "toy.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write("smiles,t1,t2\nCCO,1,0\nCCN,0,1\n")
    graphs, _ = load_smiles_csv(str(p), label_cols=slice(1, None))
    assert graphs[0].label.tolist() == [1.0, 0.0]
    assert graphs[1].label.tolist() == [0.0, 1.0]


def test_load_moleculenet_layout(tmp_path):
    raw = tmp_path / "BBBP" / "raw"
    raw.mkdir(parents=True)
    (raw / "BBBP.csv").write_text(
        "num,name,p_np,smiles\n1,a,1,CCO\n2,b,0,c1ccccc1\n")
    graphs, skipped = load_moleculenet(str(tmp_path), "BBBP")
    assert len(graphs) == 2 and not skipped
    assert graphs[0].label.tolist() == [1.0]


def test_load_ogb_raw(tmp_path):
    # two graphs: triangle (3 nodes) and edge pair (2 nodes)
    def wgz(name, text):
        with gzip.open(tmp_path / name, "wt") as f:
            f.write(text)

    wgz("num-node-list.csv.gz", "3\n2\n")
    wgz("num-edge-list.csv.gz", "3\n1\n")
    wgz("edge.csv.gz", "0,1\n1,2\n2,0\n0,1\n")
    wgz("node-feat.csv.gz", "\n".join(
        ",".join(str(v) for v in [i] * 9) for i in range(5)) + "\n")
    wgz("graph-label.csv.gz", "1\n0\n")
    graphs = load_ogb_graphs(str(tmp_path))
    assert len(graphs) == 2
    assert graphs[0].num_nodes == 3 and graphs[0].num_edges == 6
    assert graphs[1].num_nodes == 2 and graphs[1].num_edges == 2
    assert graphs[0].label.tolist() == [1.0]
    assert graphs[1].node_feat[0, 0] == 3.0   # offsets respected


def test_smiles_graph_feeds_pipeline():
    """SMILES graphs run through the packer + model end to end."""
    import jax

    from scgib_tpu.data.loader import GraphDataset, plan_capacities
    from scgib_tpu.graph.batching import pack_graphs, pack_subgraphs
    from scgib_tpu.models.scgib import PretrainModel

    smis = ["CCO", "c1ccccc1", "CC(=O)Oc1ccccc1C(=O)O", "C1CCCCC1",
            "N[C@@H](C)C(=O)O", "Cn1cnc2c1c(=O)n(C)c(=O)n2C"]
    ds = GraphDataset([smiles_to_graph(s) for s in smis], k=1)
    caps = plan_capacities(ds, len(smis))
    g = pack_graphs(ds.graphs, caps.nodes, caps.edges, caps.graphs)
    sub = pack_subgraphs(ds.graphs, ds.egonets, caps.sub_nodes,
                         caps.sub_edges)
    model = PretrainModel(in_dim=9, hidden=16, d_transfer=8)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g, sub, train=True)
    losses = model.apply(variables, g, sub, train=False,
                         rngs={"noise": jax.random.PRNGKey(2)})
    assert np.isfinite(float(losses.total))
