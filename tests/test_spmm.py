"""SpMM / SDDMM primitives vs. dense adjacency references."""

import numpy as np
import jax.numpy as jnp

from scgib_tpu.ops.spmm import (gather_mean, gather_sum, gcn_norm_sum,
                                sddmm_dot)


def random_graph(rng, n=20, e=60, d=8):
    s = rng.integers(0, n, size=e).astype(np.int32)
    r = rng.integers(0, n, size=e).astype(np.int32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    mask = rng.random(e) < 0.85
    A = np.zeros((n, n), dtype=np.float32)
    for i in range(e):
        if mask[i]:
            A[s[i], r[i]] += 1.0   # multigraph semantics: sum duplicates
    return s, r, x, mask, A


def test_gather_sum_equals_dense(rng):
    s, r, x, mask, A = random_graph(rng)
    out = gather_sum(jnp.array(x), jnp.array(s), jnp.array(r), 20,
                     jnp.array(mask))
    np.testing.assert_allclose(out, A.T @ x, rtol=1e-4, atol=1e-5)


def test_gather_sum_edge_weights(rng):
    s, r, x, mask, A = random_graph(rng)
    w = rng.normal(size=s.shape[0]).astype(np.float32)
    out = gather_sum(jnp.array(x), jnp.array(s), jnp.array(r), 20,
                     jnp.array(mask), jnp.array(w))
    expect = np.zeros_like(x)
    for i in range(len(s)):
        if mask[i]:
            expect[r[i]] += w[i] * x[s[i]]
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_gather_mean_equals_dense(rng):
    s, r, x, mask, A = random_graph(rng)
    deg = A.T.sum(1, keepdims=True)
    expect = (A.T @ x) / np.maximum(deg, 1.0)
    out = gather_mean(jnp.array(x), jnp.array(s), jnp.array(r), 20,
                      jnp.array(mask))
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_gcn_norm_sum_equals_dense(rng):
    """D_dst^{-1/2} A^T D_src^{-1/2} x with zero-degree rows zeroed
    (DGL GraphConv norm='both', allow_zero_in_degree)."""
    s, r, x, mask, A = random_graph(rng)
    out_deg = A.sum(1)   # out-degree of sources
    in_deg = A.sum(0)    # in-degree of destinations
    dn = np.where(in_deg > 0, 1 / np.sqrt(np.maximum(in_deg, 1e-30)), 0.0)
    sn = np.where(out_deg > 0, 1 / np.sqrt(np.maximum(out_deg, 1e-30)), 0.0)
    expect = dn[:, None] * (A.T @ (sn[:, None] * x))
    out = gcn_norm_sum(jnp.array(x), jnp.array(s), jnp.array(r), 20,
                       jnp.array(mask))
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_sddmm_dot(rng):
    s, r, x, mask, _ = random_graph(rng)
    y = rng.normal(size=x.shape).astype(np.float32)
    out = sddmm_dot(jnp.array(x), jnp.array(y), jnp.array(s), jnp.array(r))
    expect = np.sum(x[s] * y[r], axis=-1)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_sddmm_dot_heads(rng):
    s, r, x, mask, _ = random_graph(rng, d=12)
    xh = x.reshape(20, 3, 4)
    yh = rng.normal(size=xh.shape).astype(np.float32)
    out = sddmm_dot(jnp.array(xh), jnp.array(yh), jnp.array(s), jnp.array(r))
    expect = np.sum(xh[s] * yh[r], axis=-1)
    assert out.shape == (len(s), 3)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)
