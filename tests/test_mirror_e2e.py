"""Mirror-mode end-to-end rehearsal (VERDICT round-2 item 5).

The full user journey the reference's README describes
(/root/reference/README.md:62-98) as ONE flow, against a localhost
mirror standing in for the real MoleculeNet URLs:

    cli download --base_url <mirror>     (deepchem CSV layout)
    cli preprocess                        (raw CSV -> packed .npz cache)
    cli finetune --cache                  (train/val/test + RESULT line)

The mini-Tox21 CSV carries 120 generated-but-realistic drug-like SMILES
(amides, anilines, sulfonamides, heteroaromatics — the motifs the
round-3 featurizer work covered) with 12 multi-task columns containing
NaN holes, exercising the MetricWrapper-style label masking end to end.
"""

import gzip
import http.server
import os
import threading

import numpy as np
import pytest

from scgib_tpu import cli

TASKS = ["NR-AR", "NR-AR-LBD", "NR-AhR", "NR-Aromatase", "NR-ER",
         "NR-ER-LBD", "NR-PPAR-gamma", "SR-ARE", "SR-ATAD5", "SR-HSE",
         "SR-MMP", "SR-p53"]

_CORES = ["c1ccccc1", "c1ccncc1", "c1cc[nH]c1", "c1ccsc1", "c1ccoc1",
          "C1CCCCC1", "c1ccc2ccccc2c1", "C1CCNCC1"]
_LINKS = ["C(=O)N", "C(=O)O", "S(=O)(=O)N", "OC", "NC(=O)C", "C#N",
          "C(F)(F)F", "N(C)C", "CCO", "C=CC"]


def _smiles_pool(n):
    """Drug-like SMILES: core + substituent combinations (parseable by
    data/smiles.py AND realistic — amide/aniline/sulfonamide motifs)."""
    out = []
    i = 0
    while len(out) < n:
        core = _CORES[i % len(_CORES)]
        link = _LINKS[(i // len(_CORES)) % len(_LINKS)]
        tail = ["C", "CC", "CCC", "c1ccccc1"][i % 4]
        out.append(f"{tail}{link}{core}" if i % 2 else f"C{link}{tail}")
        i += 1
    return out[:n]


@pytest.fixture(scope="module")
def mirror(tmp_path_factory):
    src = tmp_path_factory.mktemp("mirror_e2e")
    rng = np.random.default_rng(7)
    smiles = _smiles_pool(120)
    rows = []
    for j, smi in enumerate(smiles):
        labels = []
        for t in range(12):
            r = rng.random()
            if r < 0.25:
                labels.append("")                    # NaN hole
            else:
                labels.append(str(int(rng.random() < 0.4)))
        rows.append(",".join(labels + [f"TOX{j}", smi]))
    csv = ",".join(TASKS + ["mol_id", "smiles"]) + "\n" + "\n".join(rows)
    (src / "tox21.csv.gz").write_bytes(gzip.compress(csv.encode()))

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **k):
            super().__init__(*a, directory=str(src), **k)

        def log_message(self, *a, **k):
            pass

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_download_preprocess_finetune_journey(mirror, tmp_path, capsys):
    root = str(tmp_path / "molnet")
    cache = str(tmp_path / "tox21.npz")
    ckpt_out = str(tmp_path / "ft.msgpack")
    xlsx = str(tmp_path / "outputs_excels.xlsx")
    journal = str(tmp_path / "results.jsonl")

    # 1. download from the mirror (same code path as the real URLs)
    cli.main(["download", "--dataset", "Tox21", "--root", root,
              "--base_url", mirror])
    assert os.path.exists(os.path.join(root, "Tox21", "raw",
                                       "tox21.csv.gz"))

    # 2. preprocess: raw CSV -> packed npz cache (k=1 ego-nets)
    cli.main(["preprocess", "--dataset", "Tox21", "--molnet_root", root,
              "--k", "1", "--out", cache])
    assert os.path.exists(cache)

    # 3. fine-tune on the cache; small model, few epochs
    cli.main(["finetune", "--dataset", "Tox21", "--cache", cache,
              "--epochs", "2", "--batch_size", "16", "--hidden", "16",
              "--d_transfer", "8", "--repeats", "1",
              "--out", ckpt_out, "--xlsx", xlsx, "--journal", journal])
    out = capsys.readouterr().out
    assert "RESULT Tox21: rocauc test@best-val =" in out
    val = float(out.split("test@best-val =")[1].split("+-")[0])
    assert 0.0 <= val <= 1.0
    assert os.path.exists(ckpt_out)
    assert os.path.exists(journal)
    # xlsx tracker (or its CSV fallback when openpyxl is absent)
    assert os.path.exists(xlsx) or os.path.exists(
        xlsx.replace(".xlsx", ".csv"))
