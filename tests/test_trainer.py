"""Trainer: optimizer semantics, jitted steps, freeze masks."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.batching import pack_graphs, pack_subgraphs
from scgib_tpu.graph.egonet import extract_egonets
from scgib_tpu.models.scgib import FinetuneModel, PretrainModel
from scgib_tpu.train.trainer import (TrainState, adam_l2,
                                     finetune_trainable_mask,
                                     make_finetune_step, make_pretrain_step,
                                     masked_tx)

FEAT = 5
HID = 16
DT = 8


def build(n_graphs=4, num_tasks=None, seed=11):
    graphs = random_dataset(n_graphs, seed=seed, min_nodes=5, max_nodes=9,
                            feat_dim=FEAT, num_tasks=num_tasks)
    egos = [extract_egonets(g, 1) for g in graphs]
    g = pack_graphs(graphs, 64, 256, n_graphs)
    sub = pack_subgraphs(graphs, egos, 256, 1024)
    return g, sub


def test_adam_l2_matches_torch_adam():
    """grad += wd*param before Adam moments (torch.optim.Adam semantics)."""
    import torch

    w0 = np.array([1.0, -2.0, 0.5], dtype=np.float32)
    grads = [np.array([0.1, -0.3, 0.2], dtype=np.float32),
             np.array([-0.2, 0.1, 0.4], dtype=np.float32)]
    lr, wd = 1e-3, 1e-2

    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)
    for gv in grads:
        opt.zero_grad()
        tw.grad = torch.tensor(gv)
        opt.step()

    for flatten in (True, False):   # flattened update must be identical
        tx = adam_l2(lr, weight_decay=wd, flatten=flatten)
        params = {"w": jnp.asarray(w0)}
        state = tx.init(params)
        for gv in grads:
            updates, state = tx.update({"w": jnp.asarray(gv)}, state,
                                       params)
            params = optax.apply_updates(params, updates)

        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tw.detach().numpy(), rtol=1e-6,
                                   atol=1e-7)


@pytest.fixture(scope="module")
def pretrain_setup():
    g, sub = build()
    model = PretrainModel(in_dim=FEAT, hidden=HID, d_transfer=DT)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g, sub, train=True)
    return g, sub, model, variables


def test_pretrain_step_reduces_loss(pretrain_setup):
    g, sub, model, variables = pretrain_setup
    tx = adam_l2(1e-2)
    state = TrainState.create(variables, tx)
    step = make_pretrain_step(model, tx, donate=False)
    rng = jax.random.PRNGKey(2)
    first = None
    for i in range(20):
        rng, k = jax.random.split(rng)
        state, losses = step(state, g, sub, k)
        if first is None:
            first = float(losses.total)
    assert np.isfinite(float(losses.total))
    assert float(losses.total) < first
    assert int(state.step) == 20


def test_finetune_step_and_freeze():
    g, sub = build(num_tasks=1)
    model = FinetuneModel(in_dim=FEAT, num_out=1, hidden=HID, d_transfer=DT)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g, sub, train=True)

    mask = finetune_trainable_mask(variables["params"], mode="reference")
    tx = masked_tx(adam_l2(1e-3, weight_decay=1e-5), mask)
    state = TrainState.create(variables, tx)
    step = make_finetune_step(model, tx, loss_type="bce", donate=False)

    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    rng = jax.random.PRNGKey(3)
    for _ in range(3):
        rng, k = jax.random.split(rng)
        state, loss = step(state, g, sub, k)
    assert np.isfinite(float(loss))

    # frozen core params unchanged; trainable ones moved
    flat0 = jax.tree_util.tree_flatten_with_path(p0)[0]
    flat1 = dict(jax.tree_util.tree_flatten_with_path(
        jax.tree_util.tree_map(np.asarray, state.params))[0])
    flatm = dict(jax.tree_util.tree_flatten_with_path(mask)[0])
    n_frozen = n_trained = 0
    for path, before in flat0:
        after = flat1[path]
        trainable = flatm[path]
        if trainable:
            n_trained += 1
        else:
            np.testing.assert_array_equal(before, after,
                                          err_msg=str(path))
            n_frozen += 1
    assert n_frozen > 0 and n_trained > 0


def test_freeze_mask_modes():
    g, sub = build(num_tasks=1)
    model = FinetuneModel(in_dim=FEAT, num_out=1, hidden=HID, d_transfer=DT)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g, sub, train=True)
    params = variables["params"]

    def trainable_names(mask):
        out = set()
        for path, v in jax.tree_util.tree_flatten_with_path(mask)[0]:
            if v:
                out.add("/".join(getattr(p, "key", str(p)) for p in path))
        return out

    ref = trainable_names(finetune_trainable_mask(params, "reference"))
    paper = trainable_names(finetune_trainable_mask(params, "paper"))
    frozen = trainable_names(finetune_trainable_mask(params, "frozen"))
    full = trainable_names(finetune_trainable_mask(params, "all"))

    # reference: conv2/bn2 of both encoders + all fresh heads
    assert any("core/encoder1/conv2" in n for n in ref)
    assert any("core/encoder2/conv2" in n for n in ref)
    assert not any("core/encoder1/conv3" in n for n in ref)
    assert not any("core/compressor" in n for n in ref)
    assert any(n.startswith("transfer_d") for n in ref)
    assert any(n.startswith("predict") for n in ref)
    # paper adds conv3
    assert any("core/encoder1/conv3" in n for n in paper)
    # frozen: no core params at all, heads still trainable
    assert not any("core/" in n for n in frozen)
    assert any(n.startswith("predict") for n in frozen)
    # all: everything
    assert ref < paper < full
    assert frozen < ref


def test_pretrain_step_remat(pretrain_setup):
    """jax.checkpoint-wrapped step matches the plain step's loss."""
    g, sub, model, variables = pretrain_setup
    tx = adam_l2(1e-3)
    plain = make_pretrain_step(model, tx, donate=False)
    remat = make_pretrain_step(model, tx, donate=False, remat=True)
    s1 = TrainState.create(variables, tx)
    s2 = TrainState.create(variables, tx)
    k = jax.random.PRNGKey(7)
    s1, l1 = plain(s1, g, sub, k)
    s2, l2 = remat(s2, g, sub, k)
    np.testing.assert_allclose(float(l2.total), float(l1.total),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_model_rngs_rbg_dropout_default():
    """The dropout stream defaults to an rbg key (round-5: threefry masks
    cost ~660 us/step on the Transformer); the noise stream stays a raw
    threefry key for resume bit-compatibility."""
    import jax

    from scgib_tpu.train.trainer import _model_rngs

    r = _model_rngs(jax.random.PRNGKey(0))
    assert r["noise"].dtype == jax.numpy.uint32        # raw threefry key
    assert jax.dtypes.issubdtype(r["dropout"].dtype, jax.dtypes.prng_key)
    assert "rbg" in str(r["dropout"].dtype)
    # deterministic: same input key -> same rbg key data
    r2 = _model_rngs(jax.random.PRNGKey(0))
    assert (jax.random.key_data(r["dropout"])
            == jax.random.key_data(r2["dropout"])).all()
    # and usable by flax Dropout
    from flax import linen as nn

    y = nn.Dropout(0.5, deterministic=False).apply(
        {}, jax.numpy.ones((8, 8)), rngs={"dropout": r["dropout"]})
    assert bool(jax.numpy.isfinite(y).all())


def test_flatten_resident_params_matches_optax_flatten():
    """adam_l2's resident-params flatten (the flat params vector carried
    in the optimizer state instead of re-concatenated per step) produces
    BIT-IDENTICAL updates to optax.flatten over many steps, and the
    carried vector stays equal to flatten(params)."""
    import optax as _optax

    rng = np.random.default_rng(7)
    params = {
        "a": jnp.asarray(rng.normal(size=(5, 3)), jnp.float32),
        "b": {"w": jnp.asarray(rng.normal(size=(3,)), jnp.float32),
              "k": jnp.asarray(rng.normal(size=(2, 2)), jnp.float32)},
    }
    inner = _optax.chain(_optax.add_decayed_weights(5e-5),
                         _optax.scale_by_adam(),
                         _optax.scale(-1e-3))
    tx_ref = _optax.flatten(inner)
    tx_res = adam_l2(1e-3, weight_decay=5e-5)   # resident-params default

    p_ref = jax.tree_util.tree_map(jnp.copy, params)
    p_res = jax.tree_util.tree_map(jnp.copy, params)
    s_ref = tx_ref.init(p_ref)
    s_res = tx_res.init(p_res)
    for i in range(5):
        grads = jax.tree_util.tree_map(
            lambda x: jnp.asarray(
                rng.normal(size=x.shape) + 0.1 * i, jnp.float32), params)
        u_ref, s_ref = tx_ref.update(grads, s_ref, p_ref)
        u_res, s_res = tx_res.update(grads, s_res, p_res)
        for la, lb in zip(jax.tree_util.tree_leaves(u_ref),
                          jax.tree_util.tree_leaves(u_res)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_res = optax.apply_updates(p_res, u_res)
    # the carried flat vector tracks the real params exactly
    _, p_flat = s_res
    want = jnp.concatenate([jnp.ravel(x)
                            for x in jax.tree_util.tree_leaves(p_res)])
    np.testing.assert_array_equal(np.asarray(p_flat), np.asarray(want))
