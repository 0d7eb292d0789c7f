"""Unit tests for masked segment reductions vs. naive NumPy loops."""

import numpy as np
import jax.numpy as jnp
import pytest

from scgib_tpu.ops.segment import (segment_count, segment_max, segment_mean,
                                   segment_normalize_exp, segment_softmax,
                                   segment_std_mean, segment_sum)


def make_case(rng, n=50, g=6, d=4):
    seg = np.sort(rng.integers(0, g, size=n)).astype(np.int32)
    data = rng.normal(size=(n, d)).astype(np.float32)
    mask = rng.random(n) < 0.8
    return data, seg, mask


def test_segment_sum_masked(rng):
    data, seg, mask = make_case(rng)
    out = segment_sum(jnp.array(data), jnp.array(seg), 6, jnp.array(mask))
    for s in range(6):
        sel = (seg == s) & mask
        np.testing.assert_allclose(out[s], data[sel].sum(0), rtol=1e-5,
                                   atol=1e-5)


def test_segment_mean_masked(rng):
    data, seg, mask = make_case(rng)
    out = segment_mean(jnp.array(data), jnp.array(seg), 6, jnp.array(mask))
    for s in range(6):
        sel = (seg == s) & mask
        expect = data[sel].mean(0) if sel.any() else np.zeros(4)
        np.testing.assert_allclose(out[s], expect, rtol=1e-5, atol=1e-5)


def test_segment_std_mean_matches_torch_semantics(rng):
    """std must be unbiased (ddof=1) like torch.std_mean (models.py:647)."""
    data, seg, mask = make_case(rng, n=80)
    std, mean = segment_std_mean(jnp.array(data), jnp.array(seg), 6,
                                 jnp.array(mask))
    for s in range(6):
        sel = (seg == s) & mask
        k = sel.sum()
        if k >= 2:
            np.testing.assert_allclose(std[s], data[sel].std(0, ddof=1),
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(mean[s], data[sel].mean(0),
                                       rtol=1e-5, atol=1e-6)
        elif k == 1:
            # torch would give NaN; we clamp to 0 (documented deviation)
            np.testing.assert_allclose(std[s], np.zeros(4), atol=1e-6)


def test_segment_softmax(rng):
    data, seg, mask = make_case(rng, d=1)
    logits = data[:, 0]
    out = np.array(segment_softmax(jnp.array(logits), jnp.array(seg), 6,
                                   jnp.array(mask)))
    for s in range(6):
        sel = (seg == s) & mask
        if sel.any():
            e = np.exp(logits[sel] - logits[sel].max())
            np.testing.assert_allclose(out[sel], e / e.sum(), rtol=1e-5,
                                       atol=1e-6)
    assert np.all(out[~mask] == 0)


def test_segment_softmax_sums_to_one(rng):
    data, seg, mask = make_case(rng, d=1)
    out = np.array(segment_softmax(jnp.array(data[:, 0]), jnp.array(seg), 6,
                                   jnp.array(mask)))
    for s in range(6):
        sel = (seg == s) & mask
        if sel.any():
            assert abs(out[sel].sum() - 1.0) < 1e-5


def test_segment_max(rng):
    data, seg, mask = make_case(rng)
    out = segment_max(jnp.array(data), jnp.array(seg), 6, jnp.array(mask))
    for s in range(6):
        sel = (seg == s) & mask
        if sel.any():
            np.testing.assert_allclose(out[s], data[sel].max(0), rtol=1e-6)


def test_segment_normalize_exp_reference_edge_softmax(rng):
    """The graph transformer's exp(clamp)/sum+eps normalizer
    (models.py:899,917)."""
    data, seg, mask = make_case(rng, d=1)
    scores = data[:, 0] * 4  # push into clamp range
    out = np.array(segment_normalize_exp(jnp.array(scores), jnp.array(seg),
                                         6, jnp.array(mask)))
    e = np.exp(np.clip(scores, -5, 5)) * mask
    for s in range(6):
        sel = seg == s
        z = e[sel].sum()
        np.testing.assert_allclose(out[sel], e[sel] / (z + 1e-6), rtol=1e-5,
                                   atol=1e-7)


def test_segment_count(rng):
    _, seg, mask = make_case(rng)
    out = np.array(segment_count(jnp.array(seg), 6, jnp.array(mask)))
    for s in range(6):
        assert out[s] == ((seg == s) & mask).sum()


def test_dense_path_matches_scatter(rng, monkeypatch):
    """The one-hot MXU fast path (SCGIB_SEGMENT_DENSE=1) must agree with
    the scatter path on values AND gradients — masks, empty segments,
    out-of-range ids, 1-D and 2-D data, softmax/std_mean included."""
    import jax

    n, g = 64, 7
    seg = np.sort(rng.integers(0, g, size=n)).astype(np.int32)
    seg[-3:] = g + 1                     # out-of-range ids must be dropped
    data = rng.normal(size=(n, 5)).astype(np.float32)
    logits = rng.normal(size=n).astype(np.float32) * 3
    mask = rng.random(n) < 0.75

    def run_all():
        outs = [
            segment_sum(jnp.array(data), jnp.array(seg), g, jnp.array(mask)),
            segment_mean(jnp.array(data), jnp.array(seg), g, jnp.array(mask)),
            segment_softmax(jnp.array(logits), jnp.array(seg), g,
                            jnp.array(mask)),
            segment_count(jnp.array(seg), g, jnp.array(mask)),
        ]
        outs.extend(segment_std_mean(jnp.array(data), jnp.array(seg), g,
                                     jnp.array(mask)))
        grad = jax.grad(lambda x: (segment_sum(
            x, jnp.array(seg), g, jnp.array(mask)) ** 2).sum())(
                jnp.array(data))
        gsm = jax.grad(lambda x: (segment_softmax(
            x, jnp.array(seg), g, jnp.array(mask)) ** 2).sum())(
                jnp.array(logits))
        return [np.array(o) for o in outs + [grad, gsm]]

    monkeypatch.setenv("SCGIB_SEGMENT_DENSE", "0")
    ref = run_all()
    monkeypatch.setenv("SCGIB_SEGMENT_DENSE", "1")
    dense = run_all()
    for r, d in zip(ref, dense):
        np.testing.assert_allclose(d, r, rtol=1e-5, atol=1e-6)
