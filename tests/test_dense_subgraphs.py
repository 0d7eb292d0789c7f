"""Dense-block ego-net path vs the COO segment path: same parameters must
give the same candidate embeddings and losses (the parameter trees are
identical by construction)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.batching import (max_egonet_size, pack_graphs,
                                      pack_subgraphs, pack_subgraphs_dense)
from scgib_tpu.graph.egonet import extract_egonets
from scgib_tpu.models.scgib import PretrainModel

FEAT, HID, DT = 5, 16, 8


@pytest.fixture(scope="module")
def setup():
    graphs = random_dataset(6, seed=17, min_nodes=5, max_nodes=12,
                            feat_dim=FEAT)
    egos = [extract_egonets(g, 1) for g in graphs]
    g = pack_graphs(graphs, 96, 384, 8)
    sub_coo = pack_subgraphs(graphs, egos, 384, 2048)
    s_max = max(8, max_egonet_size(egos))
    sub_dense = pack_subgraphs_dense(graphs, egos, 96, s_max)

    coo_model = PretrainModel(in_dim=FEAT, hidden=HID, d_transfer=DT,
                              deterministic=True)
    dense_model = PretrainModel(in_dim=FEAT, hidden=HID, d_transfer=DT,
                                deterministic=True, subgraph_mode="dense")
    variables = coo_model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g, sub_coo, train=True)
    return g, sub_coo, sub_dense, coo_model, dense_model, variables


def test_param_trees_identical(setup):
    g, sub_coo, sub_dense, coo_model, dense_model, variables = setup
    dense_vars = dense_model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g, sub_dense, train=True)
    p1 = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
          jax.tree_util.tree_flatten_with_path(variables)[0]}
    p2 = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
          jax.tree_util.tree_flatten_with_path(dense_vars)[0]}
    assert p1 == p2


def test_losses_match(setup):
    g, sub_coo, sub_dense, coo_model, dense_model, variables = setup
    l1, _ = coo_model.apply(variables, g, sub_coo, train=True,
                            mutable=["batch_stats"],
                            rngs={"noise": jax.random.PRNGKey(2)})
    l2, _ = dense_model.apply(variables, g, sub_dense, train=True,
                              mutable=["batch_stats"],
                              rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(float(l2.kl), float(l1.kl), rtol=1e-4)
    np.testing.assert_allclose(float(l2.contrastive),
                               float(l1.contrastive), rtol=1e-4)
    np.testing.assert_allclose(float(l2.reconstruction),
                               float(l1.reconstruction), rtol=1e-3)


def test_candidates_match(setup):
    g, sub_coo, sub_dense, coo_model, dense_model, variables = setup
    from scgib_tpu.models.losses import l2_normalize
    from scgib_tpu.models.scgib import _sub_features
    from scgib_tpu.ops.segment import segment_sum

    def cand_coo(m, g_, sub_):
        xs = m.transfer_d(l2_normalize(_sub_features(g_, sub_)))
        h_sub = m.core.encoder2(xs, sub_.senders, sub_.receivers,
                                node_mask=sub_.node_mask,
                                edge_mask=sub_.edge_mask, train=True)
        return segment_sum(h_sub, sub_.node_center, g_.num_nodes,
                           mask=sub_.node_mask)

    def cand_dense(m, g_, sub_):
        xs = m.transfer_d(l2_normalize(_sub_features(g_, sub_)))
        h_sub = m.core.encoder2(xs, sub_.adj, mask=sub_.mask, train=True)
        return jnp.sum(h_sub * sub_.mask.astype(h_sub.dtype)[:, :, None],
                       axis=1)

    c1, _ = coo_model.apply(variables, g, sub_coo, method=cand_coo,
                            mutable=["batch_stats"])
    c2, _ = dense_model.apply(variables, g, sub_dense, method=cand_dense,
                              mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1),
                               rtol=5e-3, atol=5e-4)


def test_dense_grads_match(setup):
    g, sub_coo, sub_dense, coo_model, dense_model, variables = setup

    def loss(model, sub):
        def f(p):
            losses, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                g, sub, train=True, mutable=["batch_stats"],
                rngs={"noise": jax.random.PRNGKey(2)})
            return losses.total
        return jax.grad(f)(variables["params"])

    g1 = loss(coo_model, sub_coo)
    g2 = loss(dense_model, sub_dense)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-3)
