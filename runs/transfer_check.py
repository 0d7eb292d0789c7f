"""Does OUR scale pretraining produce a useful representation?

VERDICT round-3 item 5: fine-tune on a synthetic-but-LEARNABLE label
(the ring/structural label of test_parity_rehearsal.py, where the
imported reference checkpoint reached val AUC 0.77) starting from (a)
the reference-scale curriculum checkpoint this round produced, vs (b)
the identical model from scratch — same splits, same seeds, same
reference-style freeze (only encoder conv2 of the core trainable, so
the comparison isolates the QUALITY OF THE PRETRAINED REPRESENTATION:
a scratch core under the same freeze is a random-features baseline).

Writes runs/curriculum_r04/transfer_check.json.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

from scgib_tpu.config import DATASETS
from scgib_tpu.data.loader import (GraphDataset, batch_iterator,
                                   plan_capacities)
from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.models.scgib import FinetuneModel
from scgib_tpu.train import checkpoint as ckpt
from scgib_tpu.train.loops import run_finetune
from scgib_tpu.train.trainer import (TrainState, adam_l2,
                                     finetune_trainable_mask, make_eval_fn,
                                     make_finetune_step, masked_tx)

CP = sys.argv[1] if len(sys.argv) > 1 else \
    "runs/curriculum_r04/pretrain_scale.msgpack"
EPOCHS = int(os.environ.get("TC_EPOCHS", "14"))
SEEDS = (0, 1, 2)
BATCH = 64


def ring_dataset(n=360, seed=5):
    kw = dict(min_nodes=10, max_nodes=24, feat_dim=9)
    ringed = random_dataset(n // 2, seed=seed, extra_edge_frac=0.2, **kw)
    trees = random_dataset(n - n // 2, seed=seed + 1,
                           extra_edge_frac=0.0, **kw)
    graphs = [g for pair in zip(ringed, trees) for g in pair]
    out = []
    for g in graphs:
        has_ring = (g.num_edges // 2) > (g.num_nodes - 1)
        out.append(g.__class__(senders=g.senders, receivers=g.receivers,
                               node_feat=g.node_feat,
                               label=np.asarray([float(has_ring)],
                                                np.float32)))
    return GraphDataset(out, k=1)


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
    pre_vars, meta = ckpt.load_checkpoint(CP)
    ds = ring_dataset()
    splits = (ds.subset(range(0, 240)), ds.subset(range(240, 300)),
              ds.subset(range(300, 360)))
    caps = plan_capacities(ds, BATCH)
    model = FinetuneModel(in_dim=9, num_out=1, hidden=64, d_transfer=32,
                          num_layers=4)
    g0, sub0 = next(batch_iterator(splits[0], BATCH, caps, shuffle=False))

    results = {"pretrained": [], "scratch": []}
    for seed in SEEDS:
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.PRNGKey(seed),
             "noise": jax.random.PRNGKey(seed + 1)}, g0, sub0, train=True)
        results["scratch"].append(
            one_run(variables, model, splits, caps, 100 + seed))
        grafted = ckpt.load_core_into(variables, pre_vars)
        results["pretrained"].append(
            one_run(grafted, model, splits, caps, 100 + seed))
        print(f"seed {seed}: scratch {results['scratch'][-1]} "
              f"pretrained {results['pretrained'][-1]}", flush=True)

    def agg(rows):
        a = np.asarray(rows)
        return {"val_auc_mean": round(float(a[:, 0].mean()), 4),
                "val_auc_std": round(float(a[:, 0].std()), 4),
                "test_auc_mean": round(float(a[:, 1].mean()), 4),
                "test_auc_std": round(float(a[:, 1].std()), 4),
                "runs": [[round(v, 4) for v in r] for r in rows]}

    out = {
        "checkpoint": CP,
        "task": ("synthetic structural label (graph contains a ring), "
                 "360 graphs 240/60/60, BACE spec, reference freeze "
                 "(core conv2 only trainable -> scratch = random-"
                 "features baseline)"),
        "epochs": EPOCHS, "seeds": list(SEEDS),
        "pretrained": agg(results["pretrained"]),
        "scratch": agg(results["scratch"]),
    }
    out["pretrained_minus_scratch_test_auc"] = round(
        out["pretrained"]["test_auc_mean"] - out["scratch"]["test_auc_mean"],
        4)
    with open("runs/curriculum_r04/transfer_check.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
