"""SDF / QM9 reader tests against hand-written V2000 molblocks."""

import numpy as np

from scgib_tpu.data.sdf import iter_sdf, load_qm9, mol_to_graph


def _molblock(name, atoms, bonds, extra=""):
    """atoms: [(sym, charge_col)], bonds: [(a, b, type)] 1-indexed."""
    lines = [name, "  test", "",
             f"{len(atoms):3d}{len(bonds):3d}  0  0  0  0  0  0  0  0999 V2000"]
    for sym, cc in atoms:
        lines.append(f"    0.0000    0.0000    0.0000 {sym:<3}"
                     f" 0  {cc}  0  0  0  0  0  0  0  0  0  0")
    for a, b, t in bonds:
        lines.append(f"{a:3d}{b:3d}{t:3d}  0")
    if extra:
        lines.append(extra)
    lines.append("M  END")
    return "\n".join(lines)


def _write_sdf(path, blocks):
    path.write_text("\n$$$$\n".join(blocks) + "\n$$$$\n")


def test_methane_explicit_h(tmp_path):
    blk = _molblock("gdb_1", [("C", 0)] + [("H", 0)] * 4,
                    [(1, i, 1) for i in range(2, 6)])
    p = tmp_path / "m.sdf"
    _write_sdf(p, [blk])
    (mol, title), = list(iter_sdf(str(p)))
    assert title == "gdb_1"
    assert mol.num_atoms == 5 and len(mol.bonds) == 4
    g = mol_to_graph(mol)
    assert g.node_feat.shape == (5, 11)
    c = g.node_feat[0]
    assert c[1] == 1.0          # one-hot C
    assert c[5] == 6.0          # atomic number
    assert c[9] == 1.0          # sp3
    assert c[10] == 4.0         # 4 H neighbors
    h = g.node_feat[1]
    assert h[0] == 1.0 and h[5] == 1.0 and h[10] == 0.0


def test_bond_orders_and_hybridization(tmp_path):
    # formaldehyde C=O with 2 H
    blk = _molblock("gdb_2", [("C", 0), ("O", 0), ("H", 0), ("H", 0)],
                    [(1, 2, 2), (1, 3, 1), (1, 4, 1)])
    p = tmp_path / "m.sdf"
    _write_sdf(p, [blk])
    (mol, _), = list(iter_sdf(str(p)))
    assert mol.bonds[0].order == 2.0
    g = mol_to_graph(mol)
    assert g.node_feat[0, 8] == 1.0     # C is sp2


def test_charge_columns_and_m_chg(tmp_path):
    blk = _molblock("ion", [("N", 3)], [])          # charge col 3 => +1
    blk2 = _molblock("ion2", [("O", 0)], [], extra="M  CHG  1   1  -1")
    p = tmp_path / "m.sdf"
    _write_sdf(p, [blk, blk2])
    mols = list(iter_sdf(str(p)))
    assert mols[0][0].atoms[0].charge == 1
    assert mols[1][0].atoms[0].charge == -1


def test_malformed_block_skipped(tmp_path):
    bad = "junk\nbad\nnot a molblock"
    good = _molblock("ok", [("C", 0)], [])
    p = tmp_path / "m.sdf"
    _write_sdf(p, [bad, good])
    out = list(iter_sdf(str(p)))
    assert out[0][0] is None and out[1][0] is not None


def test_load_qm9_with_labels(tmp_path):
    blk1 = _molblock("gdb_1", [("C", 0)] + [("H", 0)] * 4,
                     [(1, i, 1) for i in range(2, 6)])
    blk2 = _molblock("gdb_2", [("O", 0), ("H", 0), ("H", 0)],
                     [(1, 2, 1), (1, 3, 1)])
    _write_sdf(tmp_path / "gdb9.sdf", [blk1, blk2])
    (tmp_path / "gdb9.sdf.csv").write_text(
        "mol_id,A,B\ngdb_1,1.5,2.5\ngdb_2,3.5,4.5\n")
    graphs, skipped = load_qm9(str(tmp_path))
    assert len(graphs) == 2 and skipped == 0
    assert graphs[0].label.tolist() == [1.5, 2.5]
    assert graphs[1].num_nodes == 3
    # feature dim matches the reference's QM9 in_dim=11
    # (exp_pretraining.py:218-219)
    assert graphs[0].node_feat.shape[1] == 11


def test_qm9_feeds_pretrain_pipeline(tmp_path):
    import jax

    from scgib_tpu.data.loader import GraphDataset, plan_capacities
    from scgib_tpu.graph.batching import pack_graphs, pack_subgraphs
    from scgib_tpu.models.scgib import PretrainModel

    blocks = [_molblock(f"gdb_{i}",
                        [("C", 0), ("C", 0), ("O", 0), ("H", 0)],
                        [(1, 2, 1), (2, 3, 1), (1, 4, 1)])
              for i in range(4)]
    _write_sdf(tmp_path / "gdb9.sdf", blocks)
    graphs, _ = load_qm9(str(tmp_path))
    ds = GraphDataset(graphs, k=1)
    caps = plan_capacities(ds, 4)
    g = pack_graphs(ds.graphs, caps.nodes, caps.edges, caps.graphs)
    sub = pack_subgraphs(ds.graphs, ds.egonets, caps.sub_nodes,
                         caps.sub_edges)
    model = PretrainModel(in_dim=11, hidden=16, d_transfer=8)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g, sub, train=True)
    losses = model.apply(variables, g, sub, train=False,
                         rngs={"noise": jax.random.PRNGKey(2)})
    assert np.isfinite(float(losses.total))
