"""Banded block-dense SpMM: layout packing, XLA reference vs segment ops,
and the fused Pallas GIN layer (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.banded import fits_band, pack_banded
from scgib_tpu.graph.batching import pack_graphs
from scgib_tpu.ops.spmm import gather_sum
from scgib_tpu.ops.spmm_banded import banded_spmm

TILE, BAND = 128, 256


@pytest.fixture(scope="module")
def batch():
    graphs = random_dataset(24, seed=31, min_nodes=8, max_nodes=30)
    return pack_graphs(graphs, 768, 4096, 24)


def test_fits_and_pack(batch):
    g = batch
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    m = np.asarray(g.edge_mask)
    assert fits_band(s[m], r[m], TILE, BAND)
    banded = pack_banded(s, r, m, g.num_nodes, TILE, BAND)
    assert banded.blocks.shape == (g.num_nodes // TILE, TILE, BAND)
    assert int(banded.blocks.sum()) == int(m.sum())


def test_banded_spmm_matches_segment(batch):
    g = batch
    banded = pack_banded(np.asarray(g.senders), np.asarray(g.receivers),
                         np.asarray(g.edge_mask), g.num_nodes, TILE, BAND)
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(g.num_nodes, 64)).astype(np.float32))
    want = gather_sum(h, g.senders, g.receivers, g.num_nodes, g.edge_mask)
    got = banded_spmm(jnp.asarray(banded.blocks),
                      jnp.asarray(banded.col_off), h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_layer_matches_reference(batch):
    from jax.experimental.pallas import tpu as pltpu

    from scgib_tpu.ops.pallas.banded import (gin_banded_layer,
                                             gin_banded_layer_reference)

    g = batch
    banded = pack_banded(np.asarray(g.senders), np.asarray(g.receivers),
                         np.asarray(g.edge_mask), g.num_nodes, TILE, BAND)
    rng = np.random.default_rng(1)
    d = 64
    h = jnp.asarray(rng.normal(size=(g.num_nodes, d)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1)
    args = (jnp.asarray(banded.blocks), jnp.asarray(banded.col_off),
            h, w1, b1, w2, b2)

    want = gin_banded_layer_reference(*args)
    with pltpu.force_tpu_interpret_mode():
        got = gin_banded_layer(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pallas_layer_grads_match(batch):
    from scgib_tpu.ops.pallas.banded import (gin_banded_layer,
                                             gin_banded_layer_reference)

    g = batch
    banded = pack_banded(np.asarray(g.senders), np.asarray(g.receivers),
                         np.asarray(g.edge_mask), g.num_nodes, TILE, BAND)
    rng = np.random.default_rng(2)
    d = 32
    h = jnp.asarray(rng.normal(size=(g.num_nodes, d)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1)
    blocks = jnp.asarray(banded.blocks)
    coff = jnp.asarray(banded.col_off)

    def loss_ref(h_, w1_, b1_, w2_, b2_):
        return jnp.sum(gin_banded_layer_reference(
            blocks, coff, h_, w1_, b1_, w2_, b2_) ** 2)

    # the custom VJP's backward is pure XLA: compare against autodiff of
    # the reference forward (forward values already proven equal above)
    def loss_custom(h_, w1_, b1_, w2_, b2_):
        from scgib_tpu.ops.pallas import banded as B
        out = B.gin_banded_layer_reference(blocks, coff, h_, w1_, b1_,
                                           w2_, b2_)
        # reuse the custom bwd by differentiating the vjp-wrapped fn in
        # interpret mode would compile the kernel; instead check _bwd
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(h, w1, b1, w2, b2)

    from scgib_tpu.ops.pallas.banded import _bwd
    out = gin_banded_layer_reference(blocks, coff, h, w1, b1, w2, b2)
    cotangent = 2.0 * out
    _, _, dh, dw1, db1, dw2, db2 = _bwd(
        (blocks, coff, h, w1, b1, w2, b2), cotangent)
    for got, want in zip((dh, dw1, db1, dw2, db2), g_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_banded_spmm_grad_matches_gather(batch):
    """The symmetric-A custom VJP equals autodiff through the
    gather+segment formulation."""
    g = batch
    banded = pack_banded(np.asarray(g.senders), np.asarray(g.receivers),
                         np.asarray(g.edge_mask), g.num_nodes, TILE, BAND)
    rng = np.random.default_rng(3)
    h = jnp.asarray(rng.normal(size=(g.num_nodes, 32)).astype(np.float32))
    blocks = jnp.asarray(banded.blocks)
    coff = jnp.asarray(banded.col_off)

    def f_banded(h_):
        return jnp.sum(banded_spmm(blocks, coff, h_) ** 2)

    def f_gather(h_):
        return jnp.sum(gather_sum(h_, g.senders, g.receivers,
                                  g.num_nodes, g.edge_mask) ** 2)

    g1 = jax.grad(f_banded)(h)
    g2 = jax.grad(f_gather)(h)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


def test_device_built_blocks_match_host():
    """banded='device' ships only col_off; building the blocks on device
    (graph/banded.py::build_blocks_jax) gives bit-identical blocks to the
    host packer, and the model takes the same banded path."""
    from scgib_tpu.data.synthetic import random_dataset
    from scgib_tpu.graph.banded import build_blocks_jax
    from scgib_tpu.graph.batching import pack_graphs

    graphs = random_dataset(16, seed=7, min_nodes=8, max_nodes=20,
                            feat_dim=9)
    gh = pack_graphs(graphs, 512, 2048, 16, banded=True)
    gd = pack_graphs(graphs, 512, 2048, 16, banded="device")
    assert gh.band_blocks is not None and gd.band_blocks is None
    np.testing.assert_array_equal(gh.band_col_off, gd.band_col_off)
    blocks = build_blocks_jax(jnp.asarray(gd.senders),
                              jnp.asarray(gd.receivers),
                              jnp.asarray(gd.edge_mask),
                              jnp.asarray(gd.band_col_off), 512)
    np.testing.assert_array_equal(np.asarray(blocks), gh.band_blocks)


def test_device_banded_model_parity():
    """Full pretrain loss identical between host-built and device-built
    banded layouts."""
    import jax as _jax

    from scgib_tpu.data.synthetic import random_dataset
    from scgib_tpu.graph.batching import pack_graphs, pack_subgraphs
    from scgib_tpu.graph.egonet import extract_egonets
    from scgib_tpu.models.scgib import PretrainModel

    graphs = random_dataset(8, seed=3, min_nodes=8, max_nodes=16,
                            feat_dim=9)
    egos = [extract_egonets(g, 1) for g in graphs]
    packs = {}
    for mode in (True, "device"):
        packs[mode] = (pack_graphs(graphs, 256, 1024, 8, banded=mode),
                       pack_subgraphs(graphs, egos, 1024, 4096,
                                      banded=mode))
    model = PretrainModel(in_dim=9, hidden=16, d_transfer=8)
    v = model.init({"params": _jax.random.PRNGKey(0),
                    "noise": _jax.random.PRNGKey(1)}, *packs[True],
                   train=True)
    losses = {m: float(model.apply(v, *packs[m], train=False,
                                   rngs={"noise": _jax.random.PRNGKey(2)}
                                   ).total)
              for m in packs}
    np.testing.assert_allclose(losses[True], losses["device"], rtol=1e-6)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="fused Pallas backward is TPU-only (CPU uses "
                           "the XLA fallback, covered above); run this "
                           "file on the device to exercise it")
def test_fused_backward_parity_tpu():
    """TPU fused backward (two Pallas kernels) == XLA reference grads."""
    from scgib_tpu.ops.pallas.banded import (gin_banded_layer,
                                             gin_banded_layer_reference)

    rng = np.random.default_rng(0)
    graphs = random_dataset(16, seed=1, min_nodes=8, max_nodes=20,
                            feat_dim=9)
    egos = [extract_egonets(g, 1) for g in graphs]
    sub = pack_subgraphs(graphs, egos, 2048, 8192)
    n = sub.node_center.shape[0]
    banded = pack_banded(np.asarray(sub.senders), np.asarray(sub.receivers),
                         np.asarray(sub.edge_mask), n, 128, 256)
    D = 64
    h = jnp.asarray(rng.normal(size=(n, D)).astype(np.float32))
    ws = [jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)
          for s in ((D, D), (D,), (D, D), (D,))]
    blocks = jnp.asarray(banded.blocks)
    coff = jnp.asarray(banded.col_off)
    ct = jnp.asarray(rng.normal(size=(n, D)).astype(np.float32))

    def lp(h, w1, b1, w2, b2):
        return jnp.sum(gin_banded_layer(blocks, coff, h, w1, b1, w2, b2)
                       * ct)

    def lr(h, w1, b1, w2, b2):
        return jnp.sum(gin_banded_layer_reference(
            blocks, coff, h, w1, b1, w2, b2) * ct)

    gp = jax.grad(lp, argnums=(0, 1, 2, 3, 4))(h, *ws)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3, 4))(h, *ws)
    for a, b in zip(gp, gr):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.abs(b).max()), 1e-6)
        assert float(np.abs(a - b).max()) / scale < 1e-5
