"""GraphSAGE Pallas-vs-fallback guard (VERDICT round-3 item 8).

History: the GraphSAGE mean-aggregation through the Pallas banded SpMM
(``spmm_banded_fast``) reproducibly crashed the ROUND-3 remote TPU
compiler with an HTTP 500 *inside this encoder's graph only* (GCN using
the identical kernel compiled fine) — so round 3 shipped the encoder on
the XLA banded fallback.  The round-4 toolchain compiles and runs the
Pallas path (1337 vs 1713 us/step on v5e-1), so it is now the default
(``SCGIB_SAGE_PALLAS=0`` restores the fallback).

These tests pin the two paths to each other so the fast path can be
flipped either way safely:

  * kernel-level: Pallas SpMM (interpret mode on CPU) == XLA banded SpMM
    on the SAGE shapes, forward and gradient;
  * encoder-level: the full GraphSAGE encoder produces identical output
    whichever SpMM implementation the flag selects;
  * a TPU-only smoke test that compiles + runs the full SAGE pretrain
    step on the real compiler — the canary for the crash recurring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scgib_tpu.graph.banded import pack_banded
from scgib_tpu.ops.spmm_banded import banded_spmm


def _sage_band(n=512, d=16, seed=0):
    rng = np.random.default_rng(seed)
    send, recv = [], []
    for v in range(n):
        for _ in range(2):
            u = int(np.clip(v + rng.integers(-20, 21), 0, n - 1))
            send += [u, v]
            recv += [v, u]
    b = pack_banded(np.asarray(send, np.int32),
                    np.asarray(recv, np.int32), None, n,
                    tile=128, band=256)
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    return jnp.asarray(b.blocks), jnp.asarray(b.col_off), x


def test_pallas_spmm_matches_xla_on_sage_shapes():
    from jax.experimental.pallas import tpu as pltpu

    from scgib_tpu.ops.pallas.banded import _spmm_pallas

    blocks, col_off, x = _sage_band()

    def loss_ref(x):
        return jnp.sum(jnp.sin(banded_spmm(blocks, col_off, x)))

    want = banded_spmm(blocks, col_off, x)
    g_want = jax.grad(loss_ref)(x)

    # mirror spmm_banded_fast's custom VJP (backward = the same kernel,
    # A == A^T) — raw pallas_call autodiff is unsupported in interpret
    @jax.custom_vjp
    def pal(x):
        return _spmm_pallas(blocks, col_off, x)

    pal.defvjp(lambda x: (pal(x), None),
               lambda _, g: (_spmm_pallas(blocks, col_off, g),))

    with pltpu.force_tpu_interpret_mode():
        got = pal(x)

        def loss_pal(x):
            return jnp.sum(jnp.sin(pal(x)))

        g_got = jax.grad(loss_pal)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-4, atol=1e-4)


def test_sage_encoder_identical_between_flag_settings(monkeypatch):
    """On CPU both flag settings resolve to the same XLA kernel — the
    encoder output must be bit-identical, proving the flag changes ONLY
    the SpMM implementation, not the math around it."""
    from scgib_tpu.data.synthetic import random_dataset
    from scgib_tpu.graph.batching import pack_graphs
    from scgib_tpu.models.encoders import GraphSAGE

    graphs = random_dataset(8, seed=3, min_nodes=8, max_nodes=20,
                            feat_dim=9)
    g = pack_graphs(graphs, 256, 1024, 8, banded=True)
    enc = GraphSAGE(hidden=16)
    h0 = jnp.asarray(np.random.default_rng(0).normal(size=(256, 16)),
                     jnp.float32)
    band = (jnp.asarray(g.band_blocks), jnp.asarray(g.band_col_off))

    def run():
        variables = enc.init(jax.random.PRNGKey(0), h0,
                             jnp.asarray(g.senders),
                             jnp.asarray(g.receivers),
                             node_mask=jnp.asarray(g.node_mask),
                             edge_mask=jnp.asarray(g.edge_mask),
                             band=band)
        return enc.apply(variables, h0, jnp.asarray(g.senders),
                         jnp.asarray(g.receivers),
                         node_mask=jnp.asarray(g.node_mask),
                         edge_mask=jnp.asarray(g.edge_mask), band=band)

    monkeypatch.setenv("SCGIB_SAGE_PALLAS", "1")
    a = np.asarray(run())
    monkeypatch.setenv("SCGIB_SAGE_PALLAS", "0")
    b = np.asarray(run())
    np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-compiler canary: TPU only")
def test_sage_pallas_full_step_compiles_on_tpu():
    """The round-3 crash canary: jit-compile and run ONE full GraphSAGE
    pretrain step with the Pallas SpMM on the real TPU compiler."""
    from scgib_tpu.data.synthetic import random_dataset
    from scgib_tpu.graph.batching import pack_graphs, pack_subgraphs
    from scgib_tpu.graph.egonet import extract_egonets
    from scgib_tpu.models.scgib import PretrainModel
    from scgib_tpu.train.trainer import (TrainState, adam_l2,
                                         make_pretrain_step)

    graphs = random_dataset(16, seed=0, min_nodes=10, max_nodes=20,
                            feat_dim=9)
    egos = [extract_egonets(g, 1) for g in graphs]
    g = pack_graphs(graphs, 512, 2048, 16, banded="device")
    sub = pack_subgraphs(graphs, egos, 2048, 8192, banded="device")
    model = PretrainModel(in_dim=9, hidden=64, d_transfer=32,
                          encoder="GraphSAGE")
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g, sub, train=True)
    tx = adam_l2(1e-4)
    step = make_pretrain_step(model, tx, donate=False)
    state, losses = step(TrainState.create(variables, tx), g, sub,
                         jax.random.PRNGKey(2))
    assert np.isfinite(float(losses.total))
