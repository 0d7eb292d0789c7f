"""CLI round-trip: ``finetune --out`` persists the fine-tuned model and
result records, and the standalone ``eval`` subcommand (the reference's
``evaluate_network``, train_moleculenetBACE.py:180-199, as a first-class
command) reproduces the run's metrics from the saved checkpoint."""

import json
import os

import numpy as np

from scgib_tpu.cli import main


def test_finetune_save_then_eval(tmp_path):
    out = str(tmp_path / "ft.msgpack")
    journal = str(tmp_path / "results.jsonl")
    res = main(["finetune", "--dataset", "BACE", "--synthetic", "100",
                "--epochs", "1", "--batch_size", "16", "--hidden", "16",
                "--d_transfer", "8", "--patience", "1",
                "--out", out, "--journal", journal, "--seed", "7"])
    assert os.path.exists(out)
    assert os.path.exists(out + ".json")
    rec = json.loads(open(journal).read().splitlines()[0])
    assert rec["dataset"] == "BACE" and rec["metric"] == "rocauc"
    assert np.isfinite(rec["mean"])

    ev = main(["eval", "--dataset", "BACE", "--synthetic", "100",
               "--checkpoint", out, "--batch_size", "16",
               "--split", "all", "--seed", "7"])
    assert set(ev) == {"train", "val", "test"}
    # split seed comes from the checkpoint config, so the test-split
    # metric must reproduce the finetune run's final-epoch test eval
    final_test = res["last"]["history"][-1][2]
    assert np.isclose(ev["test"], final_test, atol=1e-6)

    full = main(["eval", "--dataset", "BACE", "--synthetic", "100",
                 "--checkpoint", out, "--batch_size", "16",
                 "--split", "full", "--seed", "7"])
    assert np.isfinite(full["full"])
