"""Round-5 transfer check: does pretraining on the STRUCTURED corpus
produce a representation that beats a random-init core on the planted-
arrangement probe?  (VERDICT r4 next 1: the round-4 check on the
random-feature corpus came back NEGATIVE — pretrained 0.754 vs scratch
0.817 — because there was nothing to learn; data/synthetic.py's
structured generator + probe_dataset are the fix.)

Protocol (matches runs/transfer_check.py round 4, new task):
  * probe: probe_dataset planted-arrangement label (pooled-stats leak
    AUC 0.49, relational ceiling 0.87-0.90, tests/test_synthetic_
    structured.py) — 720 graphs, 480/120/120 split.
  * reference freeze (finetune_trainable_mask 'reference': only core
    conv2 + head trainable), BACE spec, 3 seeds each arm.
  * arms: (a) curriculum checkpoint core, (b) random-init core
    [scratch = random-features baseline], (c) the REFERENCE's shipped
    pre_training_v1_GIN_64_5_1.pt core as a sanity anchor (its corpus
    was real molecules, so transfer to this synthetic probe is not
    expected to match (a) — it anchors that the import path and probe
    behave).

Writes runs/curriculum_r05/transfer_check.json.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scgib_tpu.config import DATASETS
from scgib_tpu.data.loader import (GraphDataset, batch_iterator,
                                   plan_capacities)
from scgib_tpu.data.synthetic import probe_dataset
from scgib_tpu.models.scgib import FinetuneModel
from scgib_tpu.train import checkpoint as ckpt
from scgib_tpu.train.loops import run_finetune
from scgib_tpu.train.trainer import (TrainState, adam_l2,
                                     finetune_trainable_mask, make_eval_fn,
                                     make_finetune_step, masked_tx)

CP = sys.argv[1] if len(sys.argv) > 1 else \
    "runs/curriculum_r05/pretrain_scale.msgpack"
REF_CP = "/root/reference/outputs/pre_training_v1_GIN_64_5_1.pt"
EPOCHS = int(os.environ.get("TC_EPOCHS", "20"))
SEEDS = (0, 1, 2)
BATCH = 64
N = 720


def one_run(variables, model, splits, caps, seed):
    spec = DATASETS["BACE"]
    train_ds, val_ds, test_ds = splits
    mask = finetune_trainable_mask(variables["params"], "reference")
    tx = masked_tx(adam_l2(1e-3, weight_decay=1e-5), mask)
    step = make_finetune_step(model, tx, loss_type=spec.loss,
                              donate=False)
    eval_fn = make_eval_fn(model)
    res = run_finetune(step, eval_fn, TrainState.create(variables, tx),
                       train_ds, val_ds, test_ds, caps, BATCH, spec,
                       epochs=EPOCHS, patience=50, seed=seed, log=None)
    return float(res["best_val"]), float(res["test_at_best_val"])


def main():
    pre_vars, _ = ckpt.load_checkpoint(CP)

    ref_vars_flat = None
    if os.path.exists(REF_CP):
        from scgib_tpu.utils.reference_import import (
            convert_to_pretrain_variables, load_reference_state)
        ref_vars_flat = convert_to_pretrain_variables(
            load_reference_state(REF_CP))

    ds = GraphDataset(probe_dataset(N, seed=5), k=1)
    splits = (ds.subset(range(0, 480)), ds.subset(range(480, 600)),
              ds.subset(range(600, 720)))
    caps = plan_capacities(ds, BATCH)
    model = FinetuneModel(in_dim=9, num_out=1, hidden=64, d_transfer=32,
                          num_layers=4)
    g0, sub0 = next(batch_iterator(splits[0], BATCH, caps, shuffle=False))

    results = {"pretrained": [], "scratch": [], "reference_anchor": []}
    for seed in SEEDS:
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.PRNGKey(seed),
             "noise": jax.random.PRNGKey(seed + 1)}, g0, sub0, train=True)
        results["scratch"].append(
            one_run(variables, model, splits, caps, 100 + seed))
        grafted = ckpt.load_core_into(variables, pre_vars)
        results["pretrained"].append(
            one_run(grafted, model, splits, caps, 100 + seed))
        if ref_vars_flat is not None:
            ref_grafted = ckpt.load_core_into(variables, ref_vars_flat)
            results["reference_anchor"].append(
                one_run(ref_grafted, model, splits, caps, 100 + seed))
        print(f"seed {seed}: scratch {results['scratch'][-1]} "
              f"pretrained {results['pretrained'][-1]} "
              f"ref {results['reference_anchor'][-1] if ref_vars_flat else None}",
              flush=True)

    def agg(rows):
        if not rows:
            return None
        a = np.asarray(rows)
        return {"val_auc_mean": round(float(a[:, 0].mean()), 4),
                "val_auc_std": round(float(a[:, 0].std()), 4),
                "test_auc_mean": round(float(a[:, 1].mean()), 4),
                "test_auc_std": round(float(a[:, 1].std()), 4),
                "runs": [[round(v, 4) for v in r] for r in rows]}

    out = {
        "checkpoint": CP,
        "task": ("planted-arrangement probe (odd latent types at ring-"
                 "attachment sites; type multiset preserved by swaps), "
                 f"{N} graphs 480/120/120, BACE spec, reference freeze "
                 "(core conv2 only trainable -> scratch = random-"
                 "features baseline).  Probe calibration: pooled-stat "
                 "leak AUC 0.49, relational ceiling 0.87-0.90."),
        "epochs": EPOCHS, "seeds": list(SEEDS),
        "pretrained": agg(results["pretrained"]),
        "scratch": agg(results["scratch"]),
        "reference_anchor": agg(results["reference_anchor"]),
    }
    out["pretrained_minus_scratch_test_auc"] = round(
        out["pretrained"]["test_auc_mean"] - out["scratch"]["test_auc_mean"],
        4)
    with open("runs/curriculum_r05/transfer_check.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
