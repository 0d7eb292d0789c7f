"""End-to-end learning validation on a learnable synthetic task: the full
pipeline (packing -> pretraining -> core transfer -> fine-tune loop with
val/test selection) must separate planted-structure classes far above
chance.  This is the system-level test the reference entirely lacks
(SURVEY.md §4)."""

import numpy as np
import jax
import pytest

from scgib_tpu.config import DATASETS
from scgib_tpu.data.loader import GraphDataset, plan_capacities
from scgib_tpu.data.synthetic import learnable_dataset
from scgib_tpu.models.scgib import FinetuneModel, PretrainModel
from scgib_tpu.train.loops import evaluate, run_finetune, run_pretraining
from scgib_tpu.train.trainer import (TrainState, adam_l2,
                                     finetune_trainable_mask, make_eval_fn,
                                     make_finetune_step, make_pretrain_step,
                                     masked_tx)

HID, DT = 32, 16
BATCH = 32


@pytest.mark.slow
def test_full_pipeline_learns():
    graphs = learnable_dataset(240, seed=3)
    ds = GraphDataset(graphs, k=1)
    caps = plan_capacities(ds, BATCH)
    train_ds = ds.subset(range(0, 160))
    val_ds = ds.subset(range(160, 200))
    test_ds = ds.subset(range(200, 240))

    from scgib_tpu.data.loader import batch_iterator

    g0, sub0 = next(batch_iterator(train_ds, BATCH, caps, shuffle=False))

    # --- short self-supervised pretraining
    pre_model = PretrainModel(in_dim=9, hidden=HID, d_transfer=DT)
    pre_vars = pre_model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g0, sub0, train=True)
    tx = adam_l2(1e-3, weight_decay=5e-5)
    state = TrainState.create(pre_vars, tx)
    step = make_pretrain_step(pre_model, tx, donate=False)
    state, info = run_pretraining(step, state, train_ds, caps, BATCH,
                                  epochs=2, log=None)
    assert np.isfinite(info["best_loss"])
    assert info["throughput"]["edges_per_s"] > 0

    # --- fine-tune with the pretrained core (trainable: 'all' — the
    # synthetic signal needs encoder adaptation)
    ft_model = FinetuneModel(in_dim=9, num_out=1, hidden=HID,
                             d_transfer=DT)
    ft_vars = ft_model.init(
        {"params": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)},
        g0, sub0, train=True)
    from scgib_tpu.train.checkpoint import load_core_into

    ft_vars = load_core_into(ft_vars, info["best_variables"])

    mask = finetune_trainable_mask(ft_vars["params"], mode="all")
    ftx = masked_tx(adam_l2(3e-3, weight_decay=1e-5), mask)
    fstate = TrainState.create(ft_vars, ftx)
    fstep = make_finetune_step(ft_model, ftx, loss_type="bce",
                               donate=False)
    eval_fn = make_eval_fn(ft_model)
    spec = DATASETS["BACE"]

    result = run_finetune(fstep, eval_fn, fstate, train_ds, val_ds,
                          test_ds, caps, BATCH, spec, epochs=12,
                          patience=12, log=None)
    # chance is 0.5; the planted signal is strong
    assert result["test_at_best_val"] > 0.85, result


def test_pretrain_superbatch_loop(tmp_path):
    """Wire-superbatch epoch loop: runs, improves, and autosave-resumes."""
    import jax
    import numpy as np

    from scgib_tpu.data.loader import (GraphDataset, plan_capacities,
                                       superbatch_spec)
    from scgib_tpu.data.synthetic import random_dataset
    from scgib_tpu.models.scgib import PretrainModel
    from scgib_tpu.train.loops import run_pretraining
    from scgib_tpu.train.trainer import (TrainState, adam_l2, init_model,
                                         make_pretrain_superbatch_step)
    from scgib_tpu.data.loader import batch_iterator

    ds = GraphDataset(random_dataset(64, seed=0, min_nodes=6, max_nodes=14,
                                     feat_dim=9), k=1)
    caps = plan_capacities(ds, 16)
    model = PretrainModel(in_dim=9, hidden=16, d_transfer=8)
    tx = adam_l2(1e-3)
    g0, sub0 = next(batch_iterator(ds, 16, caps, shuffle=False))
    variables = init_model(model, {"params": jax.random.PRNGKey(0),
                                   "noise": jax.random.PRNGKey(1)},
                           g0, sub0, train=True)
    specs = superbatch_spec(ds, 16, caps, 2)
    step = make_pretrain_superbatch_step(model, tx, byte_spec=specs)
    # the superbatch step donates its state, which deletes the ORIGINAL
    # `variables` buffers after the first dispatch — keep a host copy for
    # the resume state below (flattened adam_l2's init reads param
    # values, so create() on donated buffers raises)
    vars_host = jax.tree_util.tree_map(np.asarray, variables)
    state = TrainState.create(variables, tx)
    autosave = str(tmp_path / "auto.msgpack")
    state, info = run_pretraining(step, state, ds, caps, 16, epochs=3,
                                  seed=1, superbatch_k=2,
                                  superbatch_spec=specs,
                                  autosave_path=autosave, log=None)
    assert np.isfinite(info["best_loss"])
    assert len(info["history"]) == 3
    assert info["history"][-1] < info["history"][0]

    # resume: a fresh state picks up at epoch 3 and runs 2 more
    state2 = TrainState.create(
        jax.tree_util.tree_map(jax.numpy.asarray, vars_host), tx)
    state2, info2 = run_pretraining(step, state2, ds, caps, 16, epochs=5,
                                    seed=1, superbatch_k=2,
                                    superbatch_spec=specs,
                                    autosave_path=autosave, log=None)
    assert len(info2["history"]) == 3 + 2  # 3 restored + 2 new
