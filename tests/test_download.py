"""Download-path round trip against a localhost HTTP server.

Closes the C23 'no download path' gap offline: serve fixture files in the
exact upstream formats from a local ``http.server``, run
``download_dataset`` with ``base_url`` pointed at it, and parse the
landed layout with the real readers — the same chain
``cli download`` + ``cli finetune`` runs against the real URLs
(exp_moleculenetBACE_BBBP.py:219-224 / exp_tudataset.py downloads).
"""

import gzip
import http.server
import io
import os
import pickle
import threading
import zipfile

import numpy as np
import pytest

from scgib_tpu.data.download import REGISTRY, download_dataset
from scgib_tpu.data.molnet import load_moleculenet
from scgib_tpu.data.tudataset import load_tudataset
from scgib_tpu.data.zinc import load_zinc


@pytest.fixture(scope="module")
def http_root(tmp_path_factory):
    """Serve a directory of fixture artifacts over localhost."""
    src = tmp_path_factory.mktemp("mirror")

    # MoleculeNet: bace.csv (plain) + tox21.csv.gz (gzipped)
    (src / "bace.csv").write_text(
        "mol,CID,Class\nCCO,1,1\nc1ccccc1,2,0\nCC(=O)O,3,1\n")
    (src / "tox21.csv.gz").write_bytes(gzip.compress(
        ("NR-AR,NR-AR-LBD,NR-AhR,NR-Aromatase,NR-ER,NR-ER-LBD,"
         "NR-PPAR-gamma,SR-ARE,SR-ATAD5,SR-HSE,SR-MMP,SR-p53,"
         "mol_id,smiles\n"
         "0,1,,0,1,0,1,0,,1,0,1,TOX1,CCN\n"
         "1,0,1,,0,1,0,1,0,,1,0,TOX2,c1ccncc1\n").encode()))

    # TUDataset: Mutagenicity.zip with the chrsmrrs text layout
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("Mutagenicity/Mutagenicity_A.txt",
                    "1, 2\n2, 1\n3, 4\n4, 3\n")
        zf.writestr("Mutagenicity/Mutagenicity_graph_indicator.txt",
                    "1\n1\n2\n2\n")
        zf.writestr("Mutagenicity/Mutagenicity_graph_labels.txt",
                    "0\n1\n")
        zf.writestr("Mutagenicity/Mutagenicity_node_labels.txt",
                    "0\n1\n2\n0\n")
    (src / "Mutagenicity.zip").write_bytes(buf.getvalue())

    # ZINC.zip: benchmarking-gnns pickles under a top dir (flattened)
    def zinc_graph(n):
        return {"num_atom": n,
                "atom_type": np.arange(n, dtype=np.int64),
                "bond_type": np.ones((n, n), dtype=np.int64)
                - np.eye(n, dtype=np.int64),
                "logP_SA_cycle_normalized": np.float32(0.5)}
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for split, k in (("train", 3), ("val", 2), ("test", 2)):
            zf.writestr(f"molecules/{split}.pickle", pickle.dumps(
                [zinc_graph(3 + i) for i in range(k)]))
            zf.writestr(f"molecules/{split}.index",
                        ",".join(str(i) for i in range(k)))
    (src / "ZINC.zip").write_bytes(buf.getvalue())

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **k):
            super().__init__(*a, directory=str(src), **k)

        def log_message(self, *a, **k):
            pass

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_moleculenet_roundtrip(http_root, tmp_path):
    root = str(tmp_path / "molnet")
    written = download_dataset("BACE", root, base_url=http_root)
    assert os.path.exists(os.path.join(root, "BACE", "raw", "bace.csv"))
    graphs, skipped = load_moleculenet(root, "BACE")
    assert len(graphs) == 3 and not skipped
    assert graphs[0].label.shape == (1,)

    # idempotent: second call fetches nothing new, same layout
    again = download_dataset("BACE", root, base_url=http_root)
    assert again == written


def test_moleculenet_gz_roundtrip(http_root, tmp_path):
    root = str(tmp_path / "molnet")
    download_dataset("Tox21", root, base_url=http_root)
    graphs, skipped = load_moleculenet(root, "Tox21")
    assert len(graphs) == 2 and not skipped
    assert graphs[0].label.shape == (12,)   # 12 tasks, NaNs preserved
    assert np.isnan(graphs[0].label).sum() == 2


def test_tudataset_roundtrip(http_root, tmp_path):
    root = str(tmp_path / "tud")
    download_dataset("Mutagenicity", root, base_url=http_root)
    graphs = load_tudataset(root, "Mutagenicity")
    assert len(graphs) == 2
    assert graphs[0].num_nodes == 2


def test_zinc_flatten_roundtrip(http_root, tmp_path):
    root = str(tmp_path / "zinc")
    download_dataset("ZINC", root, base_url=http_root)
    assert os.path.exists(os.path.join(root, "train.pickle"))
    graphs = load_zinc(root, "train", subset=True)
    assert len(graphs) == 3


def test_registry_covers_every_finetune_dataset():
    """Every dataset in the fine-tune matrix (SURVEY §2.2) has a
    download entry."""
    for name in ("BACE", "BBBP", "HIV", "Tox21", "ToxCast", "SIDER",
                 "ClinTox", "MUV", "ESOL", "FreeSolv", "Lipo",
                 "molhiv", "molpcba", "PCQM4Mv2", "QM9",
                 "Peptides-func", "Peptides-struct", "ZINC",
                 "Mutagenicity", "NCI1", "NCI109"):
        assert name in REGISTRY, name


def test_cli_download_command(http_root, tmp_path):
    """`python -m scgib_tpu.cli download` lands reader-ready files."""
    from scgib_tpu.cli import main

    root = str(tmp_path / "cli_molnet")
    main(["download", "--dataset", "BACE", "--root", root,
          "--base_url", http_root])
    graphs, _ = load_moleculenet(root, "BACE")
    assert len(graphs) == 3


def test_unknown_dataset_raises(tmp_path):
    with pytest.raises(KeyError):
        download_dataset("nope", str(tmp_path))


def test_flatten_zip_rejects_zip_slip(tmp_path):
    """A crafted member like ``top/../../escape.txt`` must not write
    outside the extraction root (ADVICE round 2: zip-slip in the manual
    flatten-zip writer)."""
    from scgib_tpu.data.download import _extract

    evil = tmp_path / "evil.zip"
    with zipfile.ZipFile(evil, "w") as zf:
        zf.writestr("top/../../escape.txt", b"pwned")
        zf.writestr("top/ok.txt", b"fine")
    root = tmp_path / "root"
    root.mkdir()
    _extract(str(evil), str(root), "flatten-zip")
    # the traversal components are stripped, not honored
    assert not (tmp_path / "escape.txt").exists()
    assert (root / "ok.txt").read_bytes() == b"fine"
    assert (root / "escape.txt").exists()      # neutralized in-root
