"""Fine-tune rehearsal from the SHIPPED reference checkpoint.

VERDICT round-1 item 1(b): everything that can be validated without the
real MoleculeNet files — fine-tune ``FinetuneModel`` from the imported
``pre_training_v1_GIN_64_5_1.pt`` artifact (the actual weights the
reference paper used, README.md:56-57) on a realistic-scale molecule set
with the BACE spec (BCE loss, ROC-AUC metric, test-at-best-val), and
assert the training DYNAMICS the reference exhibits:

  * the train loss decreases over epochs,
  * validation ROC-AUC ends far above chance on a structurally
    learnable label (graph contains a ring),
  * the reference freeze mask is honored bit-exactly (frozen pretrained
    leaves unchanged, unfrozen conv2 + fresh heads updated).

Marked slow; the per-dataset real-data recipes live in PARITY.md.
"""

import os

import jax
import numpy as np
import pytest

from scgib_tpu.config import DATASETS
from scgib_tpu.data.loader import GraphDataset, plan_capacities
from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.models.scgib import FinetuneModel
from scgib_tpu.train import checkpoint as ckpt
from scgib_tpu.train.loops import run_finetune
from scgib_tpu.train.trainer import (TrainState, adam_l2,
                                     finetune_trainable_mask, make_eval_fn,
                                     make_finetune_step, masked_tx)

REF_CP = "/root/reference/outputs/pre_training_v1_GIN_64_5_1.pt"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.exists(REF_CP),
                       reason="reference artifact not present"),
]


def _ring_labeled_dataset(n=360, seed=5):
    """Molecule-like graphs labeled by a GIN-learnable structural
    property: 1 iff the graph contains a cycle (|E|/2 > n-1).  Half the
    pool is generated as pure trees so the label is balanced."""
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
    labels = np.array([float(g.label[0]) for g in out])
    assert 0.25 < labels.mean() < 0.75, "label balance off"
    return GraphDataset(out, k=1)


@pytest.fixture(scope="module")
def rehearsal():
    from scgib_tpu.utils.reference_import import (
        convert_to_pretrain_variables, load_reference_state)

    flat = load_reference_state(REF_CP)
    pre_vars, meta = convert_to_pretrain_variables(flat)
    assert meta["num_convs"] == 5            # the shipped artifact's depth

    ds = _ring_labeled_dataset()
    train_ds = ds.subset(range(0, 240))
    val_ds = ds.subset(range(240, 300))
    test_ds = ds.subset(range(300, 360))
    caps = plan_capacities(ds, 64)

    model = FinetuneModel(in_dim=9, num_out=1, hidden=64, d_transfer=32,
                          num_layers=meta["num_convs"])
    from scgib_tpu.data.loader import batch_iterator

    g0, sub0 = next(batch_iterator(train_ds, 64, caps, shuffle=False))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g0, sub0, train=True)
    variables = ckpt.load_core_into(variables, pre_vars)
    return model, variables, (train_ds, val_ds, test_ds), caps


def test_reference_core_grafts_into_finetune_model(rehearsal):
    model, variables, _, _ = rehearsal
    # spot-check: encoder1 conv0 kernel must be the reference tensor, not
    # a fresh init (reference freezes what it loaded, models.py:422-434)
    k = np.asarray(
        variables["params"]["core"]["encoder1"]["conv0"]["Dense_0"]
        ["kernel"])
    assert k.shape == (32, 64)
    assert np.abs(k).sum() > 0


def test_finetune_from_reference_checkpoint(rehearsal):
    model, variables, (train_ds, val_ds, test_ds), caps = rehearsal
    spec = DATASETS["BACE"]                  # BCE + ROC-AUC + max select
    mask = finetune_trainable_mask(variables["params"], "reference")
    tx = masked_tx(adam_l2(1e-3, weight_decay=1e-5), mask)
    step = make_finetune_step(model, tx, loss_type=spec.loss)
    eval_fn = make_eval_fn(model)
    state = TrainState.create(variables, tx)

    frozen_before = {
        "compressor_fc1": np.asarray(
            variables["params"]["core"]["compressor"]["fc1"]["kernel"]),
        "enc1_conv0": np.asarray(
            variables["params"]["core"]["encoder1"]["conv0"]["Dense_0"]
            ["kernel"]),
        "enc2_conv4": np.asarray(
            variables["params"]["core"]["encoder2"]["conv4"]["Dense_0"]
            ["kernel"]),
    }
    unfrozen_before = np.asarray(
        variables["params"]["core"]["encoder1"]["conv2"]["Dense_0"]
        ["kernel"])
    head_before = np.asarray(
        variables["params"]["predict"]["Dense_0"]["kernel"])

    result = run_finetune(step, eval_fn, state, train_ds, val_ds, test_ds,
                          caps, 64, spec, epochs=18, patience=50,
                          log=None)

    # (a) training dynamics: loss decreases substantially (late single-
    # epoch spikes are normal for saturating BCE at lr 1e-3)
    # history rows are (train_loss, val_metric, test_metric)
    losses = [h[0] for h in result["history"]]
    assert min(losses) < losses[0] * 0.75, losses
    assert all(np.isfinite(losses)), losses

    # (b) quality: ROC-AUC far above chance on the structural label
    assert result["best_val"] > 0.75, result
    assert result["test_at_best_val"] > 0.70, result

    # (c) freeze mask honored bit-exactly
    p = result["state"].params
    np.testing.assert_array_equal(
        np.asarray(p["core"]["compressor"]["fc1"]["kernel"]),
        frozen_before["compressor_fc1"])
    np.testing.assert_array_equal(
        np.asarray(p["core"]["encoder1"]["conv0"]["Dense_0"]["kernel"]),
        frozen_before["enc1_conv0"])
    np.testing.assert_array_equal(
        np.asarray(p["core"]["encoder2"]["conv4"]["Dense_0"]["kernel"]),
        frozen_before["enc2_conv4"])
    # the single unfrozen encoder layer (conv2, models.py:424-434 net
    # effect) and the fresh heads must actually move
    assert not np.array_equal(
        np.asarray(p["core"]["encoder1"]["conv2"]["Dense_0"]["kernel"]),
        unfrozen_before)
    assert not np.array_equal(
        np.asarray(p["predict"]["Dense_0"]["kernel"]), head_before)
