"""Quantify the eval-noise deviation (VERDICT round-3 item 7).

Our default evaluation (``make_eval_fn``) runs eval-mode BatchNorm with a
FIXED noise rng; the reference evaluates with live train-mode noise and
batch statistics (``evaluate_network`` never calls ``model.eval()`` or
switches the gate off, train_moleculenetBACE.py:112-176).  This module
measures the metric spread the reference's mode introduces and asserts
the test-at-best-val SELECTION is stable between modes — the documented
bound lives in PARITY.md.
"""

import jax
import numpy as np

from scgib_tpu.config import DATASETS
from scgib_tpu.data.loader import (GraphDataset, batch_iterator,
                                   plan_capacities)
from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.models.scgib import FinetuneModel
from scgib_tpu.train.loops import PackedEval, run_finetune
from scgib_tpu.train.trainer import (TrainState, adam_l2, make_eval_fn,
                                     make_finetune_step)

BATCH = 32


def _ring_dataset(n=240, seed=5):
    """Structurally learnable binary label: graph contains a cycle."""
    kw = dict(min_nodes=10, max_nodes=20, feat_dim=9)
    ringed = random_dataset(n // 2, seed=seed, extra_edge_frac=0.25, **kw)
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


def _trained_state():
    ds = _ring_dataset()
    train_ds = ds.subset(range(0, 160))
    val_ds = ds.subset(range(160, 200))
    test_ds = ds.subset(range(200, 240))
    caps = plan_capacities(ds, BATCH)
    spec = DATASETS["BACE"]

    model = FinetuneModel(in_dim=9, num_out=1, hidden=32, d_transfer=16)
    g0, sub0 = next(batch_iterator(train_ds, BATCH, caps, shuffle=False))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g0, sub0, train=True)
    tx = adam_l2(1e-3, weight_decay=1e-5)
    step = make_finetune_step(model, tx, loss_type=spec.loss,
                              donate=False)
    return (model, tx, step, spec, caps, variables,
            (train_ds, val_ds, test_ds))


def test_eval_noise_spread_and_selection_stability(capsys):
    (model, tx, step, spec, caps, variables,
     (train_ds, val_ds, test_ds)) = _trained_state()

    det_eval = make_eval_fn(model, live_noise=False)
    live_eval = make_eval_fn(model, live_noise=True)

    # one full fine-tune under EACH eval mode, identical training stream
    # (same seed -> identical weights per epoch; only the per-epoch
    # metric evaluation differs) — the selection must agree
    res_det = run_finetune(step, det_eval,
                           TrainState.create(variables, tx), train_ds,
                           val_ds, test_ds, caps, BATCH, spec, epochs=10,
                           seed=11, log=None)
    res_live = run_finetune(step, live_eval,
                            TrainState.create(variables, tx), train_ds,
                            val_ds, test_ds, caps, BATCH, spec, epochs=10,
                            seed=11, log=None)

    # training stream identical: per-epoch train losses must match
    np.testing.assert_allclose([h[0] for h in res_det["history"]],
                               [h[0] for h in res_live["history"]],
                               rtol=1e-6)

    # (1) per-checkpoint metric spread of the live-noise mode
    final_vars = res_det["state"].variables
    ev = PackedEval(val_ds, caps, BATCH, spec)
    det_val = ev.evaluate(det_eval, final_vars)
    live_vals = [ev.evaluate(live_eval, final_vars,
                             rng=jax.random.PRNGKey(1000 + s))
                 for s in range(8)]
    spread = float(np.std(live_vals))
    shift = float(abs(np.mean(live_vals) - det_val))
    print(f"\nEVAL-NOISE det_val={det_val:.4f} "
          f"live mean={np.mean(live_vals):.4f} std={spread:.4f} "
          f"shift={shift:.4f}")

    # measured (PARITY.md): live-noise AUC std ~0.010; mode shift ~0.057
    # on the ring rehearsal — dominated by train-mode BN batch statistics
    # vs running stats, not by the gate noise itself.  Assert with
    # headroom so only a real regression (noise accidentally off, BN
    # stats garbage) trips it
    assert spread < 0.06, (spread, live_vals)
    assert shift < 0.10, (det_val, live_vals)

    # (2) selection stability: test-at-best-val must agree between modes
    # within the live mode's own noise floor
    print(f"EVAL-NOISE selection det: epoch {res_det['best_epoch']} "
          f"test {res_det['test_at_best_val']:.4f} | live: epoch "
          f"{res_live['best_epoch']} test {res_live['test_at_best_val']:.4f}")
    assert abs(res_det["test_at_best_val"]
               - res_live["test_at_best_val"]) < 0.08, (res_det, res_live)


def test_selection_stability_across_streams(capsys):
    """VERDICT r4 weak 7: the round-4 bound rested on ONE training
    stream.  Repeat the det-vs-live selection agreement over three
    independent training streams (seeds) and record the spread — the
    PARITY.md bound quotes these numbers."""
    (model, tx, step, spec, caps, variables,
     (train_ds, val_ds, test_ds)) = _trained_state()

    det_eval = make_eval_fn(model, live_noise=False)
    live_eval = make_eval_fn(model, live_noise=True)

    rows = []
    for seed in (21, 22, 23):
        res_det = run_finetune(step, det_eval,
                               TrainState.create(variables, tx), train_ds,
                               val_ds, test_ds, caps, BATCH, spec,
                               epochs=8, seed=seed, log=None)
        res_live = run_finetune(step, live_eval,
                                TrainState.create(variables, tx), train_ds,
                                val_ds, test_ds, caps, BATCH, spec,
                                epochs=8, seed=seed, log=None)
        rows.append((seed, res_det["test_at_best_val"],
                     res_live["test_at_best_val"],
                     res_det["best_epoch"], res_live["best_epoch"]))

    gaps = [abs(d - l) for _, d, l, _, _ in rows]
    print("\nEVAL-NOISE multi-stream det-vs-live test@best-val:")
    for seed, d, l, ed, el in rows:
        print(f"  seed {seed}: det {d:.4f} (ep {ed}) "
              f"live {l:.4f} (ep {el}) gap {abs(d-l):.4f}")
    print(f"  max gap {max(gaps):.4f} mean gap {np.mean(gaps):.4f}")

    # every stream individually within the single-stream tolerance
    assert max(gaps) < 0.08, rows
