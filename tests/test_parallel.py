"""Data-parallel correctness: an 8-shard shard_map pretraining step must
reproduce the single-device computation over the union batch EXACTLY —
global contrastive denominator (all_gather), sync-BN statistics, psum loss
normalizers, and the all-gathered cross-shard reconstruction gram
(SURVEY.md §7.3 'keeping the contrastive loss's batch-global denominator
correct across shards').
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.batching import pack_graphs, pack_subgraphs
from scgib_tpu.graph.egonet import extract_egonets
from scgib_tpu.models.scgib import PretrainModel
from scgib_tpu.parallel.dp import (DATA_AXIS, make_dp_pretrain_step,
                                   make_mesh, stack_batches)
from scgib_tpu.train.trainer import TrainState, adam_l2, make_pretrain_step

HID = 16
DT = 8
FEAT = 5
N_DEV = 8
GRAPHS_PER_SHARD = 2

NODE_CAP, EDGE_CAP = 32, 128
SUB_NODE_CAP, SUB_EDGE_CAP = 128, 512


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= N_DEV, "conftest must provide 8 cpu devices"
    graphs = random_dataset(N_DEV * GRAPHS_PER_SHARD, seed=7, min_nodes=5,
                            max_nodes=9, feat_dim=FEAT)
    egos = [extract_egonets(g, 1) for g in graphs]

    shard_gs, shard_subs = [], []
    for i in range(N_DEV):
        chunk = graphs[i * GRAPHS_PER_SHARD:(i + 1) * GRAPHS_PER_SHARD]
        echunk = egos[i * GRAPHS_PER_SHARD:(i + 1) * GRAPHS_PER_SHARD]
        shard_gs.append(pack_graphs(chunk, NODE_CAP, EDGE_CAP,
                                    GRAPHS_PER_SHARD))
        shard_subs.append(pack_subgraphs(chunk, echunk, SUB_NODE_CAP,
                                         SUB_EDGE_CAP))

    union_g = pack_graphs(graphs, N_DEV * NODE_CAP, N_DEV * EDGE_CAP,
                          N_DEV * GRAPHS_PER_SHARD)
    union_sub = pack_subgraphs(graphs, egos, N_DEV * SUB_NODE_CAP,
                               N_DEV * SUB_EDGE_CAP)

    kw = dict(in_dim=FEAT, hidden=HID, d_transfer=DT, deterministic=True,
              kl_mode="corrected")
    model_single = PretrainModel(**kw)
    model_dp = PretrainModel(**kw, axis_name=DATA_AXIS)
    variables = model_single.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        union_g, union_sub, train=True)
    return (shard_gs, shard_subs, union_g, union_sub, model_single,
            model_dp, variables)


def test_dp_matches_single_device(setup):
    (shard_gs, shard_subs, union_g, union_sub, model_single, model_dp,
     variables) = setup

    tx = adam_l2(1e-4, weight_decay=5e-5)
    mesh = make_mesh(jax.devices()[:N_DEV])

    # single-device over the union batch
    state0 = TrainState.create(variables, tx)
    single_step = make_pretrain_step(model_single, tx, donate=False)
    state1, losses1 = single_step(state0, union_g, union_sub,
                                  jax.random.PRNGKey(3))

    # 8-way data parallel over the shards
    dp_state0 = TrainState.create(variables, tx)
    dp_step = make_dp_pretrain_step(model_dp, tx, mesh, donate=False)
    g_stacked = stack_batches(shard_gs)
    sub_stacked = stack_batches(shard_subs)
    rngs = jax.random.split(jax.random.PRNGKey(3), N_DEV)
    dp_state1, losses_dp = dp_step(dp_state0, g_stacked, sub_stacked, rngs)

    np.testing.assert_allclose(float(losses_dp.kl), float(losses1.kl),
                               rtol=1e-5)
    np.testing.assert_allclose(float(losses_dp.contrastive),
                               float(losses1.contrastive), rtol=1e-5)
    np.testing.assert_allclose(float(losses_dp.reconstruction),
                               float(losses1.reconstruction), rtol=1e-4)

    # Updated params: Adam normalizes away gradient magnitude, so params
    # with an exactly-zero true gradient (e.g. the attention bias — softmax
    # is shift-invariant) step by +-lr on float noise.  Bound by ~2*lr and
    # check true gradients separately below.
    flat1 = jax.tree_util.tree_leaves(state1.params)
    flat2 = jax.tree_util.tree_leaves(dp_state1.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=2.5e-4)


def test_dp_grads_match_single_device(setup):
    """The psum'd DP gradient equals the single-device gradient of the
    union-batch loss."""
    (shard_gs, shard_subs, union_g, union_sub, model_single, model_dp,
     variables) = setup
    from scgib_tpu.parallel.dp import shard_map, P

    params = variables["params"]
    bs = variables["batch_stats"]
    rng = jax.random.PRNGKey(3)

    def single_loss(p):
        losses, _ = model_single.apply(
            {"params": p, "batch_stats": bs}, union_g, union_sub,
            train=True, mutable=["batch_stats"], rngs={"noise": rng})
        return losses.total

    g_single = jax.grad(single_loss)(params)

    mesh = make_mesh(jax.devices()[:N_DEV])

    def shard_grad(p, g_b, sub_b, rngs):
        g_b = jax.tree_util.tree_map(lambda x: x[0], g_b)
        sub_b = jax.tree_util.tree_map(lambda x: x[0], sub_b)

        def loss_fn(pp):
            losses, _ = model_dp.apply(
                {"params": pp, "batch_stats": bs}, g_b, sub_b,
                train=True, mutable=["batch_stats"],
                rngs={"noise": rngs[0]})
            return losses.total

        return jax.lax.psum(jax.grad(loss_fn)(p), DATA_AXIS)

    dp_grad_fn = jax.jit(shard_map(
        shard_grad, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(), check_vma=False))
    g_dp = dp_grad_fn(params, stack_batches(shard_gs),
                      stack_batches(shard_subs),
                      jax.random.split(jax.random.PRNGKey(3), N_DEV))

    # atol covers float32 accumulation noise on gradients whose dominant
    # entries are O(100) (recon term): observed noise floor ~1e-4
    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-4)


def test_dp_state_replicated(setup):
    """After a DP step the state must remain fully replicated (identical
    on every device)."""
    (shard_gs, shard_subs, _ug, _us, _ms, model_dp, variables) = setup
    tx = adam_l2(1e-4)
    mesh = make_mesh(jax.devices()[:N_DEV])
    dp_step = make_dp_pretrain_step(model_dp, tx, mesh, donate=False)
    state = TrainState.create(variables, tx)
    rngs = jax.random.split(jax.random.PRNGKey(5), N_DEV)
    state, _ = dp_step(state, stack_batches(shard_gs),
                       stack_batches(shard_subs), rngs)
    # a second step must also run (state shardings round-trip)
    state, losses = dp_step(state, stack_batches(shard_gs),
                            stack_batches(shard_subs), rngs)
    assert np.isfinite(float(losses.total))


def _empty_like_batch(b):
    """Zero all validity masks: a shard carrying only padding."""
    import dataclasses

    kw = {}
    for f in ("node_mask", "edge_mask", "graph_mask"):
        kw[f] = jnp.zeros_like(getattr(b, f))
    return b.replace(**kw)


def _empty_like_sub(s):
    kw = {"node_mask": jnp.zeros_like(s.node_mask),
          "edge_mask": jnp.zeros_like(s.edge_mask)}
    return s.replace(**kw)


def test_dp_uneven_shards_with_empty_shard(setup):
    """A shard whose batch is ALL padding (no real graphs/nodes) must not
    perturb the global losses: DP over 7 real shards + 1 empty shard ==
    single device over the 7-shard union (VERDICT round-1 item 8)."""
    (shard_gs, shard_subs, _, _, model_single, model_dp, variables) = setup

    real = N_DEV - 1
    graphs = random_dataset(real * GRAPHS_PER_SHARD, seed=7, min_nodes=5,
                            max_nodes=9, feat_dim=FEAT)
    egos = [extract_egonets(g, 1) for g in graphs]
    union_g = pack_graphs(graphs, N_DEV * NODE_CAP, N_DEV * EDGE_CAP,
                          N_DEV * GRAPHS_PER_SHARD)
    union_sub = pack_subgraphs(graphs, egos, N_DEV * SUB_NODE_CAP,
                               N_DEV * SUB_EDGE_CAP)

    sgs = list(shard_gs[:real]) + [_empty_like_batch(shard_gs[real])]
    ssubs = list(shard_subs[:real]) + [_empty_like_sub(shard_subs[real])]

    tx = adam_l2(1e-4, weight_decay=5e-5)
    mesh = make_mesh(jax.devices()[:N_DEV])
    state0 = TrainState.create(variables, tx)
    single_step = make_pretrain_step(model_single, tx, donate=False)
    _, losses1 = single_step(state0, union_g, union_sub,
                             jax.random.PRNGKey(3))

    dp_step = make_dp_pretrain_step(model_dp, tx, mesh, donate=False)
    rngs = jnp.stack([jax.random.PRNGKey(3)] * N_DEV)
    _, losses8 = dp_step(TrainState.create(variables, tx),
                         stack_batches(sgs), stack_batches(ssubs), rngs)
    np.testing.assert_allclose(float(losses8.kl), float(losses1.kl),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(losses8.contrastive),
                               float(losses1.contrastive),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(losses8.reconstruction),
                               float(losses1.reconstruction),
                               rtol=2e-5, atol=1e-6)


def test_kl_reference_mode_rejected_under_dp(setup):
    """kl_mode='reference' + axis_name must error, not silently diverge
    per shard (VERDICT round-1 item 8)."""
    (shard_gs, shard_subs, *_rest) = setup
    bad = PretrainModel(in_dim=FEAT, hidden=HID, d_transfer=DT,
                        deterministic=True, kl_mode="reference",
                        axis_name=DATA_AXIS)
    with pytest.raises(ValueError, match="reference"):
        bad.init({"params": jax.random.PRNGKey(0),
                  "noise": jax.random.PRNGKey(1)},
                 shard_gs[0], shard_subs[0], train=True)
