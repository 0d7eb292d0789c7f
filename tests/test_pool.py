"""Tests for the scatter-free hot-path ops added for the round-3 perf work:

  * ``ops.segment.segment_broadcast`` — gather fwd, matmul bwd
  * ``ops.pool.sorted_segment_sum_banded`` — banded-matmul segment sum
  * ``losses.recon_adj_loss(band=...)`` — banded edge cross term

Each is checked for value AND gradient equality against the plain
implementation it replaces.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scgib_tpu.ops.pool import sorted_segment_sum_banded
from scgib_tpu.ops.segment import segment_broadcast, segment_sum


def _sorted_ids(rng, n_rows, num_segments, pad=0):
    ids = np.sort(rng.integers(0, num_segments, size=n_rows - pad))
    mask = np.ones(n_rows, bool)
    if pad:
        ids = np.concatenate([ids, np.zeros(pad, np.int64)])
        mask[n_rows - pad:] = False
    return ids.astype(np.int32), mask


def test_segment_broadcast_value_and_grad():
    rng = np.random.default_rng(0)
    ids, mask = _sorted_ids(rng, 50, 7, pad=6)
    v = jnp.asarray(rng.normal(size=(7, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)

    def f_new(v):
        return jnp.sum(jnp.tanh(segment_broadcast(v, jnp.asarray(ids), 7))
                       * w)

    def f_ref(v):
        return jnp.sum(jnp.tanh(v[jnp.asarray(ids)]) * w)

    np.testing.assert_allclose(f_new(v), f_ref(v), rtol=1e-6)
    g_new = jax.grad(f_new)(v)
    g_ref = jax.grad(f_ref)(v)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n_rows,num_segments,pad", [
    (1024, 256, 100),    # tile divides num_segments -> banded path
    (1000, 250, 0),      # indivisible -> fallback path
])
def test_sorted_segment_sum_banded_matches_plain(n_rows, num_segments, pad):
    rng = np.random.default_rng(1)
    ids, mask = _sorted_ids(rng, n_rows, num_segments, pad=pad)
    data = jnp.asarray(rng.normal(size=(n_rows, 8)), jnp.float32)
    ids_j = jnp.asarray(ids)
    mask_j = jnp.asarray(mask)

    out = sorted_segment_sum_banded(data, ids_j, num_segments,
                                    mask=mask_j, tile=64)
    ref = segment_sum(data, ids_j, num_segments, mask=mask_j)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    w = jnp.asarray(rng.normal(size=(num_segments, 8)), jnp.float32)

    def f_new(d):
        return jnp.sum(sorted_segment_sum_banded(
            d, ids_j, num_segments, mask=mask_j, tile=64) * w)

    def f_ref(d):
        return jnp.sum(segment_sum(d, ids_j, num_segments, mask=mask_j) * w)

    g_new = jax.grad(f_new)(data)
    g_ref = jax.grad(f_ref)(data)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_sorted_segment_sum_banded_skew_fallback():
    """One tile owning more rows than the window -> runtime cond fallback,
    result still exact."""
    rng = np.random.default_rng(2)
    n_rows, num_segments = 2048, 128
    # all rows in segment 3: maximal skew
    ids = jnp.asarray(np.full(n_rows, 3, np.int32))
    mask = jnp.asarray(np.ones(n_rows, bool))
    data = jnp.asarray(rng.normal(size=(n_rows, 4)), jnp.float32)
    out = sorted_segment_sum_banded(data, ids, num_segments, mask=mask,
                                    tile=64, window=256)
    ref = segment_sum(data, ids, num_segments, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_recon_adj_banded_cross_matches_coo():
    from scgib_tpu.data.synthetic import random_dataset
    from scgib_tpu.graph.batching import pack_graphs
    from scgib_tpu.models.losses import recon_adj_loss

    graphs = random_dataset(16, seed=3, min_nodes=6, max_nodes=20,
                            feat_dim=5)
    g = pack_graphs(graphs, 512, 2048, 16, banded=True)
    assert g.band_blocks is not None
    rng = np.random.default_rng(4)
    im = jnp.asarray(rng.normal(size=(512, 12)), jnp.float32)

    def f_coo(im):
        return recon_adj_loss(im, g.senders, g.receivers, g.edge_mask,
                              g.node_mask, impl="gram")

    def f_band(im):
        return recon_adj_loss(im, g.senders, g.receivers, g.edge_mask,
                              g.node_mask, impl="gram",
                              band=(g.band_blocks, g.band_col_off))

    np.testing.assert_allclose(np.asarray(f_band(im)), np.asarray(f_coo(im)),
                               rtol=1e-5)
    g_b = jax.grad(f_band)(im)
    g_c = jax.grad(f_coo)(im)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_c),
                               rtol=1e-4, atol=1e-5)
