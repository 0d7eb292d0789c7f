"""Loss-function identities and edge cases."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.batching import pack_graphs
from scgib_tpu.models.losses import (bce_loss, bce_with_logits_loss,
                                     contrastive_infonce,
                                     cross_entropy_loss, recon_adj_loss)


@pytest.fixture(scope="module")
def batch():
    graphs = random_dataset(6, seed=21, min_nodes=5, max_nodes=12,
                            feat_dim=4)
    return pack_graphs(graphs, 128, 512, 8)


def test_recon_gram_equals_dense(batch):
    """The O(N d^2) gram+SDDMM expansion is value-identical to the literal
    N x N computation (binary deduped adjacency)."""
    g = batch
    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.normal(size=(g.num_nodes, 16)).astype(np.float32))
    dense = recon_adj_loss(im, g.senders, g.receivers, g.edge_mask,
                           g.node_mask, impl="dense")
    gram = recon_adj_loss(im, g.senders, g.receivers, g.edge_mask,
                          g.node_mask, impl="gram")
    np.testing.assert_allclose(float(gram), float(dense), rtol=1e-5)


def test_recon_gram_grad_equals_dense(batch):
    g = batch
    rng = np.random.default_rng(1)
    im = jnp.asarray(rng.normal(size=(g.num_nodes, 8)).astype(np.float32))

    def f(impl):
        return jax.grad(lambda x: recon_adj_loss(
            x, g.senders, g.receivers, g.edge_mask, g.node_mask,
            impl=impl))(im)

    np.testing.assert_allclose(np.asarray(f("gram")),
                               np.asarray(f("dense")), rtol=1e-4,
                               atol=1e-4)


def test_contrastive_masks_padding(batch):
    rng = np.random.default_rng(2)
    z1 = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    mask6 = jnp.asarray([True] * 6 + [False] * 2)
    # padded rows must not influence the loss
    z1_alt = z1.at[6:].set(99.0)
    z2_alt = z2.at[6:].set(-99.0)
    a = contrastive_infonce(z1, z2, mask6)
    b = contrastive_infonce(z1_alt, z2_alt, mask6)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_bce_matches_torch():
    import torch

    rng = np.random.default_rng(3)
    p = rng.random(40).astype(np.float32) * 0.98 + 0.01
    y = (rng.random(40) < 0.5).astype(np.float32)
    ours = float(bce_loss(jnp.asarray(p), jnp.asarray(y)))
    theirs = float(torch.nn.BCELoss()(torch.tensor(p), torch.tensor(y)))
    assert ours == pytest.approx(theirs, rel=1e-6)

    logits = rng.normal(size=40).astype(np.float32)
    ours = float(bce_with_logits_loss(jnp.asarray(logits), jnp.asarray(y)))
    theirs = float(torch.nn.BCEWithLogitsLoss()(torch.tensor(logits),
                                                torch.tensor(y)))
    assert ours == pytest.approx(theirs, rel=1e-6)


def test_ce_matches_torch():
    import torch

    rng = np.random.default_rng(4)
    logits = rng.normal(size=(10, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=10)
    ours = float(cross_entropy_loss(jnp.asarray(logits),
                                    jnp.asarray(labels)))
    theirs = float(torch.nn.CrossEntropyLoss()(
        torch.tensor(logits), torch.tensor(labels)))
    assert ours == pytest.approx(theirs, rel=1e-6)


def test_logm_mode_trains_from_batch_targets():
    """recons_type='logM' end-to-end: batch_iterator(logm_k=k) attaches
    block-diagonal transition targets, the model reads them from the
    GraphBatch, and a training step produces a finite loss equal to the
    explicit-args path."""
    import jax

    from scgib_tpu.data.loader import GraphDataset, batch_iterator, \
        plan_capacities
    from scgib_tpu.data.synthetic import random_dataset
    from scgib_tpu.models.scgib import PretrainModel
    from scgib_tpu.train.trainer import TrainState, adam_l2, \
        make_pretrain_step

    k = 2
    graphs = random_dataset(12, seed=6, min_nodes=5, max_nodes=10)
    ds = GraphDataset(graphs, k=1)
    caps = plan_capacities(ds, 4)
    g, sub = next(batch_iterator(ds, 4, caps, shuffle=False, logm_k=k))
    assert g.logm_targets is not None
    assert g.logm_targets.shape == (k, caps.nodes, caps.nodes)

    model = PretrainModel(in_dim=9, hidden=16, d_transfer=8,
                          recons_type="logM", k_transition=k,
                          deterministic=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g, sub, train=False)

    # implicit (batch-carried) == explicit (call-arg) targets
    li = model.apply(variables, g, sub, train=False,
                     rngs={"noise": jax.random.PRNGKey(2)})
    le = model.apply(variables, g.replace(logm_targets=None,
                                          logm_weights=None),
                     sub, train=False,
                     logm_targets=g.logm_targets,
                     logm_weights=g.logm_weights,
                     rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(li.reconstruction),
                               np.asarray(le.reconstruction))
    assert np.isfinite(float(li.total))

    # one optimizer step runs under jit
    tx = adam_l2(1e-3)
    state = TrainState.create(variables, tx)
    step = make_pretrain_step(model, tx, donate=False)
    state, losses = step(state, g, sub, jax.random.PRNGKey(3))
    assert np.isfinite(float(losses.total))


def test_bce_grad_finite_at_sigmoid_saturation():
    """f32 sigmoid saturates to exactly 1.0; torch clamps BCE's log
    outputs at -100 with zero gradient in the clamped region.  Both the
    old clip-the-probability form (log(0) -> 0 * -inf) and a naive
    maximum(log(p), -100) (VJP: 0 * inf) produce NaN there."""
    from scgib_tpu.models.losses import bce_loss

    probs = jnp.asarray([1.0, 0.0, 0.5, 1.0])
    targets = jnp.asarray([1.0, 0.0, 1.0, 0.0])

    def f(p):
        return bce_loss(p, targets)

    val, grad = jax.value_and_grad(f)(probs)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all(), np.asarray(grad)
    # the saturated-wrong case (p=1, y=0) contributes the -100 clamp
    assert float(val) >= 20.0


def test_segment_softmax_masked_rows_no_overflow():
    """Padded rows carry logit 0 under segment id 0; when the segment's
    real logits are very negative the unmasked exp(0 - seg_max)
    overflows to inf and inf * mask(0) = NaN.  Masked rows must be -inf
    BEFORE the exp (value and grad both finite)."""
    from scgib_tpu.ops.segment import segment_softmax

    logits = jnp.asarray([-200.0, -201.0, 0.0, 0.0])   # last two padded
    seg = jnp.asarray([0, 0, 0, 0])
    mask = jnp.asarray([True, True, False, False])

    def f(x):
        a = segment_softmax(x, seg, 1, mask=mask)
        return jnp.sum(a * jnp.asarray([1.0, 2.0, 3.0, 4.0]))

    val, grad = jax.value_and_grad(f)(logits)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
    a = segment_softmax(logits, seg, 1, mask=mask)
    np.testing.assert_allclose(np.asarray(a)[2:], 0.0)
    np.testing.assert_allclose(np.asarray(a)[:2].sum(), 1.0, rtol=1e-6)


def test_contrastive_zero_readout_grads_finite():
    """An all-zero readout row (a real graph whose ReLU'd node features
    summed to exactly zero — observed after 80 epochs of stage-0
    pretraining in the round-4 curriculum) must yield FINITE InfoNCE
    gradients: l2_normalize clamps inside the sqrt, so the zero row
    contributes zero gradient instead of 0 * inf = NaN."""
    import jax

    from scgib_tpu.models.losses import contrastive_infonce, l2_normalize

    g = 8
    z1 = jnp.asarray(np.random.default_rng(0).normal(size=(g, 16)),
                     jnp.float32)
    z2 = jnp.asarray(np.random.default_rng(1).normal(size=(g, 16)),
                     jnp.float32)
    z1 = z1.at[3].set(0.0)          # real graph, zero noisy readout
    z2 = z2.at[5].set(0.0)          # real graph, zero clean readout
    mask = jnp.ones(g, bool)

    def loss(z1, z2):
        return contrastive_infonce(z1, z2, mask)

    val = loss(z1, z2)
    g1, g2 = jax.grad(loss, (0, 1))(z1, z2)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g1)))
    assert np.all(np.isfinite(np.asarray(g2)))

    # forward semantics unchanged: matches torch F.normalize's
    # x / max(||x||, eps) for both zero and non-zero rows
    n = np.asarray(l2_normalize(z1))
    ref = np.asarray(z1) / np.maximum(
        np.linalg.norm(np.asarray(z1), axis=-1, keepdims=True), 1e-12)
    np.testing.assert_allclose(n, ref, rtol=1e-6, atol=1e-7)
