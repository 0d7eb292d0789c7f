"""Assemble PRETRAIN_RUN_r04.json from the curriculum run logs.

Parses runs/curriculum_r04/run.log (+ the post-kill resume log) into the
per-stage epoch histories, early-stop events, and the kill -9 + resume
determinism evidence (VERDICT round-3 item 6)."""
import json
import os
import re
import sys

BASE = os.path.dirname(os.path.abspath(__file__))


def parse(path):
    stages = []
    cur = None
    for line in open(path):
        m = re.match(r"stage (\d+) \((\w[\w-]*)\): (\d+) graphs", line)
        if m:
            cur = {"stage": int(m.group(1)), "name": m.group(2),
                   "graphs": int(m.group(3)), "epochs": [],
                   "resumed_at": None, "early_stop": None,
                   "best": None}
            stages.append(cur)
            continue
        m = re.match(r"stage (\d+) \((\w[\w-]*)\): checkpoint exists",
                     line)
        if m:
            stages.append({"stage": int(m.group(1)), "name": m.group(2),
                           "skipped": True})
            continue
        if cur is None:
            continue
        m = re.match(r"resumed autosave at epoch (\d+) \(best ([\d.]+)\)",
                     line)
        if m:
            cur["resumed_at"] = {"epoch": int(m.group(1)),
                                 "best_loss": float(m.group(2))}
        m = re.match(r"pretrain epoch (\d+): loss ([\w.eE+-]+) "
                     r"\((\d+) edges/s\)", line)
        if m:
            try:
                loss = float(m.group(2))
            except ValueError:
                loss = None
            if loss is not None and loss != loss:   # NaN -> null in JSON
                loss = None
            cur["epochs"].append({"epoch": int(m.group(1)),
                                  "loss": loss,
                                  "cum_edges_per_s": int(m.group(3))})
        m = re.match(r"early stop at epoch (\d+) \(patience (\d+)\)", line)
        if m:
            cur["early_stop"] = {"epoch": int(m.group(1)),
                                 "patience": int(m.group(2))}
        m = re.match(r"stage \d+ \(\w[\w-]*\): best loss ([\d.]+)", line)
        if m:
            cur["best"] = float(m.group(1))
    return stages


def main():
    out = {
        "config": {
            "stages": ["PCQM4Mv2(synthetic,9d)", "QM9(synthetic,11d)",
                       "mol-PCBA(synthetic,9d)"],
            "graphs_per_stage": 100000,
            "epochs_per_stage": 100,
            "patience": 50,
            "batch_size": 128,
            "superbatch": 32,
            "wire": "compact delta/offset, one combined buffer",
            "autosave_every_epoch": True,
            "command": open(os.path.join(BASE, "run.sh")).read()
            .strip().splitlines()[-7:],
        },
        "runs": {},
    }
    for name in sys.argv[1:] or ["run.log"]:
        p = os.path.join(BASE, name)
        if os.path.exists(p):
            out["runs"][name] = parse(p)
    tc = os.path.join(BASE, "transfer_check.json")
    if os.path.exists(tc):
        out["transfer_check"] = json.load(open(tc))
    res = os.path.join(BASE, "resume_determinism.json")
    if os.path.exists(res):
        out["resume_determinism"] = json.load(open(res))
    dest = "/root/repo/PRETRAIN_RUN_r04.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    n_ep = sum(len(s.get("epochs", ())) for r in out["runs"].values()
               for s in r)
    print(f"wrote {dest}: {n_ep} epochs across "
          f"{list(out['runs'])}")


if __name__ == "__main__":
    main()
