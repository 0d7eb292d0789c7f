"""Preemption-safe autosave/resume: an interrupted pretraining run resumed
from its autosave reaches bit-identical state to an uninterrupted run
(params, optimizer moments, RNG stream, early-stop counters)."""

import numpy as np
import jax
import jax.numpy as jnp

from scgib_tpu.data.loader import GraphDataset, batch_iterator, \
    plan_capacities
from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.models.scgib import PretrainModel
from scgib_tpu.train.checkpoint import load_train_state, save_train_state
from scgib_tpu.train.loops import run_pretraining
from scgib_tpu.train.trainer import TrainState, adam_l2, make_pretrain_step

BATCH = 8
HID, DT = 16, 8


def _setup():
    graphs = random_dataset(24, seed=5, min_nodes=6, max_nodes=14)
    ds = GraphDataset(graphs, k=1)
    caps = plan_capacities(ds, BATCH)
    g0, sub0 = next(batch_iterator(ds, BATCH, caps, shuffle=False))
    model = PretrainModel(in_dim=9, hidden=HID, d_transfer=DT)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g0, sub0, train=True)
    tx = adam_l2(1e-3, weight_decay=5e-5)
    step = make_pretrain_step(model, tx, donate=False)
    return ds, caps, variables, tx, step


def test_save_load_roundtrip(tmp_path):
    ds, caps, variables, tx, step = _setup()
    state = TrainState.create(variables, tx)
    rng = jax.random.PRNGKey(7)
    path = str(tmp_path / "auto.msgpack")
    save_train_state(path, state, epoch=3, rng=rng,
                     extra={"best_loss": 1.25, "bad_epochs": 2})
    got, epoch, rng2, extra = load_train_state(path, state)
    assert epoch == 3
    np.testing.assert_array_equal(np.asarray(rng2), np.asarray(rng))
    assert float(extra["best_loss"]) == 1.25
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(got.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(got.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_matches_uninterrupted(tmp_path):
    ds, caps, variables, tx, step = _setup()
    path = str(tmp_path / "auto.msgpack")

    # uninterrupted: 4 epochs
    state_a = TrainState.create(variables, tx)
    state_a, info_a = run_pretraining(step, state_a, ds, caps, BATCH,
                                      epochs=4, seed=11, log=None)

    # interrupted: 2 epochs with autosave, then resume to 4
    state_b = TrainState.create(variables, tx)
    state_b, _ = run_pretraining(step, state_b, ds, caps, BATCH,
                                 epochs=2, seed=11, log=None,
                                 autosave_path=path)
    # fresh state (as after a crash/restart) — resume pulls everything
    state_c = TrainState.create(variables, tx)
    state_c, info_c = run_pretraining(step, state_c, ds, caps, BATCH,
                                      epochs=4, seed=11, log=None,
                                      autosave_path=path)

    for a, c in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_c.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    for a, c in zip(jax.tree_util.tree_leaves(state_a.opt_state),
                    jax.tree_util.tree_leaves(state_c.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    assert int(state_a.step) == int(state_c.step)
    assert info_a["best_loss"] == info_c["best_loss"]


def test_finetune_resume_matches_uninterrupted(tmp_path):
    from scgib_tpu.config import DATASETS
    from scgib_tpu.data.synthetic import learnable_dataset
    from scgib_tpu.models.scgib import FinetuneModel
    from scgib_tpu.train.loops import run_finetune
    from scgib_tpu.train.trainer import make_eval_fn, make_finetune_step

    graphs = learnable_dataset(48, seed=9)
    ds = GraphDataset(graphs, k=1)
    caps = plan_capacities(ds, BATCH)
    train_ds = ds.subset(range(0, 32))
    val_ds = ds.subset(range(32, 40))
    test_ds = ds.subset(range(40, 48))
    spec = DATASETS["BACE"]

    g0, sub0 = next(batch_iterator(train_ds, BATCH, caps, shuffle=False))
    model = FinetuneModel(in_dim=9, num_out=1, hidden=HID, d_transfer=DT)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g0, sub0, train=True)
    tx = adam_l2(1e-3, weight_decay=1e-5)
    step = make_finetune_step(model, tx, loss_type="bce", donate=False)
    eval_fn = make_eval_fn(model)
    path = str(tmp_path / "ft.msgpack")

    kw = dict(caps=caps, batch_size=BATCH, spec=spec, seed=13, log=None)
    res_a = run_finetune(step, eval_fn, TrainState.create(variables, tx),
                         train_ds, val_ds, test_ds, epochs=4, **kw)
    run_finetune(step, eval_fn, TrainState.create(variables, tx),
                 train_ds, val_ds, test_ds, epochs=2,
                 autosave_path=path, **kw)
    res_c = run_finetune(step, eval_fn, TrainState.create(variables, tx),
                         train_ds, val_ds, test_ds, epochs=4,
                         autosave_path=path, **kw)

    for a, c in zip(jax.tree_util.tree_leaves(res_a["state"].params),
                    jax.tree_util.tree_leaves(res_c["state"].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    assert res_a["best_val"] == res_c["best_val"]
    assert res_a["test_at_best_val"] == res_c["test_at_best_val"]
    assert res_a["best_epoch"] == res_c["best_epoch"]


def test_adapt_resume_matches_uninterrupted(tmp_path):
    from scgib_tpu.models.scgib import DomainAdaptModel
    from scgib_tpu.train.loops import run_domain_adaptation
    from scgib_tpu.train.trainer import make_domainadapt_step

    ds, caps, _, _, _ = _setup()
    g0, sub0 = next(batch_iterator(ds, BATCH, caps, shuffle=False))
    model = DomainAdaptModel(in_dim=9, hidden=HID, d_transfer=DT)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g0, sub0, train=True)
    tx = adam_l2(1e-3, weight_decay=1e-5)
    step = make_domainadapt_step(model, tx, donate=False)
    path = str(tmp_path / "adapt.msgpack")

    state_a, info_a = run_domain_adaptation(
        step, TrainState.create(variables, tx), ds, caps, BATCH,
        epochs=4, seed=17, log=None)
    run_domain_adaptation(
        step, TrainState.create(variables, tx), ds, caps, BATCH,
        epochs=2, seed=17, log=None, autosave_path=path)
    state_c, info_c = run_domain_adaptation(
        step, TrainState.create(variables, tx), ds, caps, BATCH,
        epochs=4, seed=17, log=None, autosave_path=path)

    for a, c in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_c.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    assert info_a["best_loss"] == info_c["best_loss"]


def test_resume_at_stage_boundary_keeps_best_weights(tmp_path):
    """A resume where the stage is ALREADY complete (start_epoch == epochs)
    must report the true best-loss weights, not the restored final state
    (ADVICE round 3: best_variables now persisted in the autosave)."""
    ds, caps, variables, tx, step = _setup()
    path = str(tmp_path / "auto.msgpack")

    state_a = TrainState.create(variables, tx)
    state_a, info_a = run_pretraining(step, state_a, ds, caps, BATCH,
                                      epochs=4, seed=11, log=None,
                                      autosave_path=path)

    # crash-restart after the final epoch's autosave: zero epochs run
    state_b = TrainState.create(variables, tx)
    state_b, info_b = run_pretraining(step, state_b, ds, caps, BATCH,
                                      epochs=4, seed=11, log=None,
                                      autosave_path=path)
    assert info_b["best_epoch"] == info_a["best_epoch"]
    assert info_b["best_loss"] == info_a["best_loss"]
    for a, b in zip(jax.tree_util.tree_leaves(info_a["best_variables"]),
                    jax.tree_util.tree_leaves(info_b["best_variables"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nan_guard_halts_pretraining(tmp_path):
    """Round-4 post-mortem (run_attempt1_nan.log): a stage burned 50
    NaN epochs because patience treated NaN as "no improvement".  The
    guard must raise at the FIRST non-finite epoch, carrying the
    last-healthy best weights — never the corrupted state."""
    import pytest

    from scgib_tpu.train.loops import NonFiniteLossError

    ds, caps, variables, tx, step = _setup()
    calls = {"n": 0}

    def poisoned_step(state, g, sub, rng):
        state, losses = step(state, g, sub, rng)
        calls["n"] += 1
        if calls["n"] > 4:   # diverge partway through epoch 1
            losses = losses._replace(kl=jnp.float32(jnp.nan))
        return state, losses

    state = TrainState.create(variables, tx)
    with pytest.raises(NonFiniteLossError) as ei:
        run_pretraining(poisoned_step, state, ds, caps, BATCH,
                        epochs=10, seed=11, log=None)
    info = ei.value.info
    assert info["nonfinite_epoch"] == 1
    # epoch 0 was healthy and tracked
    assert info["best_epoch"] == 0
    assert np.isfinite(info["best_loss"])
    assert info["best_variables"] is not None
    for leaf in jax.tree_util.tree_leaves(info["best_variables"]):
        assert np.isfinite(np.asarray(leaf)).all()
