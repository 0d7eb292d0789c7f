"""Mirror-mode end-to-end journeys for EVERY raw dataset family.

test_mirror_e2e.py rehearses the MoleculeNet-CSV family; this module
drives the remaining five raw formats the reference consumes — TUDataset
text (exp_tudataset.py), QM9 SDF (exp_qm9.py:281), OGB graph-dir CSVs
(exp_molhiv.py:223-224), LRGB peptides func+struct
(exp_pep_func_5.py:251-257), and benchmarking-gnns ZINC pickles
(molecules.py:18-94) — through the SAME user journey the reference
README describes (README.md:62-98):

    cli download --base_url <mirror>  ->  cli preprocess  ->
    cli finetune (RESULT line)

plus one adapt-before-finetune flow (run_domain_adaptation,
exp_moleculenetBACE_BBBP.py:122-130).  Every byte each journey consumes
travels through the real downloader (fetch, unpack, layout), the real
raw-format reader, the cache, and the real training loop — so day-one
real data only swaps the mirror URL for the upstream one.
"""

import gzip
import http.server
import io
import os
import pickle
import tarfile
import threading
import zipfile

import numpy as np
import pytest

from scgib_tpu import cli

pytestmark = pytest.mark.filterwarnings("ignore")


# ---------------------------------------------------------------------------
# fixture artifact generators (one valid raw distribution per family)
# ---------------------------------------------------------------------------

def _tud_zip(n_graphs=60, seed=3):
    """chrsmrrs TUDataset text layout: path graphs, 2 classes."""
    rng = np.random.default_rng(seed)
    a_lines, ind_lines, glab_lines, nlab_lines = [], [], [], []
    node_id = 0
    for gi in range(n_graphs):
        n = int(rng.integers(4, 9))
        base = node_id + 1                      # 1-indexed
        for v in range(n - 1):
            a_lines.append(f"{base + v}, {base + v + 1}")
            a_lines.append(f"{base + v + 1}, {base + v}")
        for v in range(n):
            ind_lines.append(str(gi + 1))
            nlab_lines.append(str(int(rng.integers(0, 4))))
        glab_lines.append(str(gi % 2))
        node_id += n
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("Mutagenicity/Mutagenicity_A.txt",
                    "\n".join(a_lines) + "\n")
        zf.writestr("Mutagenicity/Mutagenicity_graph_indicator.txt",
                    "\n".join(ind_lines) + "\n")
        zf.writestr("Mutagenicity/Mutagenicity_graph_labels.txt",
                    "\n".join(glab_lines) + "\n")
        zf.writestr("Mutagenicity/Mutagenicity_node_labels.txt",
                    "\n".join(nlab_lines) + "\n")
    return buf.getvalue()


def _molblock(name, atoms, bonds):
    lines = [name, "  gen", "",
             f"{len(atoms):3d}{len(bonds):3d}  0  0  0  0  0  0  0  0999 "
             "V2000"]
    for sym in atoms:
        lines.append(f"    0.0000    0.0000    0.0000 {sym:<3}"
                     f" 0  0  0  0  0  0  0  0  0  0  0  0")
    for a, b, t in bonds:
        lines.append(f"{a:3d}{b:3d}{t:3d}  0")
    lines.append("M  END")
    return "\n".join(lines)


def _qm9_tar(n_mols=48, seed=5):
    """gdb9.tar.gz: gdb9.sdf (alkane chains with explicit H) +
    gdb9.sdf.csv (19 regression targets per record)."""
    rng = np.random.default_rng(seed)
    blocks, csv_rows = [], []
    for i in range(n_mols):
        nc = int(rng.integers(2, 6))            # carbons in the chain
        atoms = ["C"] * nc
        bonds = [(j, j + 1, 1) for j in range(1, nc)]
        hid = nc
        for j in range(1, nc + 1):              # fill valence with H
            nh = 4 - sum(1 for a, b, _ in bonds if a == j or b == j)
            for _ in range(nh):
                hid += 1
                atoms.append("H")
                bonds.append((j, hid, 1))
        name = f"gdb_{i + 1}"
        blocks.append(_molblock(name, atoms, bonds))
        targets = rng.normal(size=19).round(4)
        csv_rows.append(",".join([name] + [str(t) for t in targets]))
    sdf = ("\n$$$$\n".join(blocks) + "\n$$$$\n").encode()
    csv = ("mol_id," + ",".join(f"t{j}" for j in range(19)) + "\n"
           + "\n".join(csv_rows) + "\n").encode()
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for fname, data in (("gdb9.sdf", sdf), ("gdb9.sdf.csv", csv)):
            ti = tarfile.TarInfo(fname)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    return buf.getvalue()


def _ogb_hiv_zip(n_graphs=60, seed=7):
    """OGB graph-prop flat-CSV layout inside hiv.zip -> hiv/raw/."""
    rng = np.random.default_rng(seed)
    num_nodes, num_edges, edges, feats, labels = [], [], [], [], []
    for gi in range(n_graphs):
        n = int(rng.integers(5, 12))
        num_nodes.append(n)
        es = [(v, v + 1) for v in range(n - 1)]
        if n > 3:
            es.append((0, n - 1))
        num_edges.append(len(es))
        edges += es
        for v in range(n):
            feats.append([int(rng.integers(0, 5))] + [0] * 8)
        labels.append(gi % 2)
    gz = lambda rows: gzip.compress(
        ("\n".join(",".join(str(x) for x in np.atleast_1d(r))
                   for r in rows) + "\n").encode())
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("hiv/raw/num-node-list.csv.gz", gz(num_nodes))
        zf.writestr("hiv/raw/num-edge-list.csv.gz", gz(num_edges))
        zf.writestr("hiv/raw/edge.csv.gz", gz(edges))
        zf.writestr("hiv/raw/node-feat.csv.gz", gz(feats))
        zf.writestr("hiv/raw/graph-label.csv.gz", gz(labels))
    return buf.getvalue()


_SMILES = ["CCO", "CCN", "CCC", "c1ccccc1", "c1ccncc1", "CC(=O)O",
           "CC(=O)N", "CCS", "CCCl", "C1CCCCC1", "c1ccoc1", "CC#N"]


def _peptides_func_gz(n=48, seed=9):
    rows = []
    rng = np.random.default_rng(seed)
    for i in range(n):
        smi = _SMILES[i % len(_SMILES)] + "C" * (i % 3)
        lab = "[" + ", ".join(str(int(rng.random() < 0.4))
                              for _ in range(10)) + "]"
        rows.append(f'{smi},"{lab}"')
    return gzip.compress(("smiles,labels\n" + "\n".join(rows) + "\n")
                         .encode())


def _peptides_struct_gz(n=48, seed=11):
    cols = ["Inertia_mass_a", "Inertia_mass_b", "Inertia_mass_c",
            "Inertia_valence_a", "Inertia_valence_b", "Inertia_valence_c",
            "length_a", "length_b", "length_c", "Spherocity",
            "Plane_best_fit"]
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        smi = _SMILES[i % len(_SMILES)] + "N" * (i % 2)
        vals = rng.normal(size=len(cols)).round(4)
        rows.append(",".join([smi] + [str(v) for v in vals]))
    return gzip.compress(("smiles," + ",".join(cols) + "\n"
                          + "\n".join(rows) + "\n").encode())


def _zinc_zip(seed=13):
    rng = np.random.default_rng(seed)

    def mol(n):
        bond = np.zeros((n, n), np.int64)
        for v in range(n - 1):
            bond[v, v + 1] = bond[v + 1, v] = 1
        return {"num_atom": n,
                "atom_type": rng.integers(0, 5, size=n).astype(np.int64),
                "bond_type": bond,
                "logP_SA_cycle_normalized": np.float32(rng.normal())}
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for split, k in (("train", 40), ("val", 8), ("test", 8)):
            zf.writestr(f"molecules/{split}.pickle", pickle.dumps(
                [mol(int(rng.integers(5, 12))) for _ in range(k)]))
            zf.writestr(f"molecules/{split}.index",
                        ",".join(str(i) for i in range(k)))
    return buf.getvalue()


@pytest.fixture(scope="module")
def mirror(tmp_path_factory):
    src = tmp_path_factory.mktemp("family_mirror")
    (src / "Mutagenicity.zip").write_bytes(_tud_zip())
    (src / "gdb9.tar.gz").write_bytes(_qm9_tar())
    (src / "hiv.zip").write_bytes(_ogb_hiv_zip())
    (src / "peptide_multi_class_dataset.csv.gz").write_bytes(
        _peptides_func_gz())
    (src / "peptide_structure_dataset.csv.gz").write_bytes(
        _peptides_struct_gz())
    (src / "ZINC.zip").write_bytes(_zinc_zip())

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **k):
            super().__init__(*a, directory=str(src), **k)

        def log_message(self, *a, **k):
            pass

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


# ---------------------------------------------------------------------------
# the journeys: download -> preprocess -> finetune, per family
# ---------------------------------------------------------------------------

_TINY = ["--epochs", "2", "--batch_size", "8", "--hidden", "16",
         "--d_transfer", "8", "--repeats", "1"]


def _journey(mirror, tmp_path, capsys, download_name, finetune_name,
             preprocess_args, metric):
    root = str(tmp_path / "root")
    cache = str(tmp_path / "cache.npz")
    cli.main(["download", "--dataset", download_name, "--root", root,
              "--base_url", mirror])
    cli.main(["preprocess", "--dataset", finetune_name, "--k", "1",
              "--out", cache] + [a.format(root=root)
                                 for a in preprocess_args])
    assert os.path.exists(cache)
    cli.main(["finetune", "--dataset", finetune_name, "--cache", cache]
             + _TINY)
    out = capsys.readouterr().out
    assert f"RESULT {finetune_name}: {metric} test@best-val =" in out
    val = float(out.split("test@best-val =")[1].split("+-")[0])
    assert np.isfinite(val)
    return val


def test_tudataset_journey(mirror, tmp_path, capsys):
    acc = _journey(mirror, tmp_path, capsys, "Mutagenicity",
                   "Mutagenicity", ["--tudataset_root", "{root}"], "acc")
    assert 0.0 <= acc <= 1.0


def test_qm9_sdf_journey(mirror, tmp_path, capsys):
    _journey(mirror, tmp_path, capsys, "QM9", "QM9",
             ["--qm9_root", "{root}"], "mae")


def test_ogb_graphdir_journey(mirror, tmp_path, capsys):
    auc = _journey(mirror, tmp_path, capsys, "molhiv", "ogbg-molhiv",
                   ["--ogb_raw", "{root}/hiv/raw"], "rocauc")
    assert 0.0 <= auc <= 1.0


def test_peptides_func_journey(mirror, tmp_path, capsys):
    ap = _journey(mirror, tmp_path, capsys, "Peptides-func",
                  "Peptides-func", ["--peptides_root", "{root}"], "ap")
    assert 0.0 <= ap <= 1.0


def test_peptides_struct_journey(mirror, tmp_path, capsys):
    _journey(mirror, tmp_path, capsys, "Peptides-struct",
             "Peptides-struct", ["--peptides_root", "{root}"], "mae")


def test_zinc_journey(mirror, tmp_path, capsys):
    _journey(mirror, tmp_path, capsys, "ZINC", "ZINC",
             ["--zinc_root", "{root}"], "mae")


def test_adapt_then_finetune_flow(mirror, tmp_path, capsys):
    """The reference's optional domain-adaptation stage before fine-tuning
    (exp_moleculenetBACE_BBBP.py:122-130): adapt on the unlabeled target
    graphs, then fine-tune from the adapted core."""
    root = str(tmp_path / "root")
    cache = str(tmp_path / "cache.npz")
    adapted = str(tmp_path / "adapted.msgpack")
    cli.main(["download", "--dataset", "Mutagenicity", "--root", root,
              "--base_url", mirror])
    cli.main(["preprocess", "--dataset", "Mutagenicity", "--k", "1",
              "--tudataset_root", root, "--out", cache])
    cli.main(["adapt", "--dataset", "Mutagenicity", "--cache", cache,
              "--out", adapted] + _TINY)
    assert os.path.exists(adapted)
    cli.main(["finetune", "--dataset", "Mutagenicity", "--cache", cache,
              "--pretrained", adapted] + _TINY)
    out = capsys.readouterr().out
    assert "loaded pretrained core" in out
    assert "RESULT Mutagenicity: acc test@best-val =" in out


def test_transformer_encoder_journey(mirror, tmp_path, capsys):
    """The Graph Transformer encoder through the same CLI journey (its
    banded flash path is TPU-only; on CPU this drives the XLA banded /
    COO attention through the full finetune flow)."""
    root = str(tmp_path / "root")
    cache = str(tmp_path / "cache.npz")
    cli.main(["download", "--dataset", "Mutagenicity", "--root", root,
              "--base_url", mirror])
    cli.main(["preprocess", "--dataset", "Mutagenicity", "--k", "1",
              "--tudataset_root", root, "--out", cache])
    cli.main(["finetune", "--dataset", "Mutagenicity", "--cache", cache,
              "--encoder", "Transformer", "--num_layers", "2",
              "--num_heads", "4"] + _TINY)
    out = capsys.readouterr().out
    assert "RESULT Mutagenicity: acc test@best-val =" in out
