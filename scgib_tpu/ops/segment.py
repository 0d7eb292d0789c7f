"""Masked segment reductions — the workhorse ops of the framework.

These replace the reference's DGL segment kernels:
  * ``dgl.sum_nodes``            (models.py:716, 725)      -> segment_sum
  * per-graph ``torch.std_mean`` (models.py:647)           -> segment_mean/std
  * per-graph ``F.softmax(dim=0)``(models.py:746)          -> segment_softmax
  * DGL edge-softmax normalizer  (models.py:902-917)       -> segment_sum

All functions take an explicit ``num_segments`` (static) and an optional
boolean mask so padded entries never contribute.  Data is expected sorted by
segment id (the packer guarantees it), which lets XLA use the fast sorted
scatter path.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.knobs import env_knob as _env_knob


def _apply_mask(data: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return data
    m = mask.astype(data.dtype)
    return data * m.reshape(m.shape + (1,) * (data.ndim - m.ndim))


# ---------------------------------------------------------------------------
# Dense one-hot fast path.
#
# XLA lowers segment reductions to scatters, which serialize on TPU — the
# per-graph ops (num_segments = batch size, ~128) measured 28-390 us each
# fwd+bwd on v5e-1 at bench shapes, dwarfing the encoder kernels.  When the
# [num_segments, N] assignment matrix is small, the same reduction is a
# dense one-hot matmul: [S, N] @ [N, d] runs on the MXU in ~us, and its
# BACKWARD is also a matmul (no scatter anywhere).  XLA CSEs the repeated
# one-hot construction across the many call sites of one jitted step.
#
# Auto-enabled on TPU for S*N <= _DENSE_LIMIT elements (per-graph ops:
# 128*4096 = 0.5M yes; per-center candidate sums: 4096*16384 = 64M no —
# those keep the scatter).  SCGIB_SEGMENT_DENSE=0/1 forces it off/on
# (tests exercise both paths on CPU).
# ---------------------------------------------------------------------------

_DENSE_LIMIT = 4 * 1024 * 1024


def _dense_ok(n_rows: int, num_segments: int) -> bool:
    mode = _env_knob("SCGIB_SEGMENT_DENSE", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return (jax.default_backend() == "tpu"
            and n_rows * num_segments <= _DENSE_LIMIT)


def _onehot(segment_ids: jnp.ndarray, num_segments: int,
            dtype) -> jnp.ndarray:
    iota = jax.lax.iota(jnp.int32, num_segments)
    return (segment_ids[None, :] == iota[:, None]).astype(dtype)


def _segment_sum_dense(data: jnp.ndarray, segment_ids: jnp.ndarray,
                       num_segments: int) -> jnp.ndarray:
    """data already masked.  [N, ...] -> [S, ...] via MXU matmul.

    precision=HIGH (3-pass bf16) rather than HIGHEST (6-pass): the
    one-hot operand is EXACTLY representable in bf16 (0/1), so the
    passes involving its low half vanish.  HIGH still reduces the DATA
    operand to its bf16x2 hi+lo representation (~2^-17 per element vs
    HIGHEST's ~2^-24), so the result is NOT f32-exact: on-chip probes
    bound the error at ~1e-6 relative vs the exact scatter (TPU_PARITY
    probes) — an accepted tradeoff for half the MXU passes.  No consumer
    relies on exactness (segment_softmax's max-shift only needs an
    approximate shift; stats paths tolerate 1e-6)."""
    n = data.shape[0]
    oh = _onehot(segment_ids, num_segments, data.dtype)
    flat = data.reshape(n, -1)
    # rows with out-of-range segment ids get a zero one-hot COLUMN, but a
    # non-finite value there would still poison the matmul (0 * inf =
    # NaN contaminates the whole output column) — drop the rows
    # themselves, matching jax.ops.segment_sum's drop semantics
    # (ADVICE round 2).
    in_range = (segment_ids >= 0) & (segment_ids < num_segments)
    flat = jnp.where(in_range[:, None], flat, 0)
    out = jnp.matmul(oh, flat, precision=jax.lax.Precision.HIGH)
    return out.reshape((num_segments,) + data.shape[1:])


def segment_sum(data: jnp.ndarray,
                segment_ids: jnp.ndarray,
                num_segments: int,
                mask: Optional[jnp.ndarray] = None,
                indices_are_sorted: bool = True) -> jnp.ndarray:
    """Masked segment sum.  data: [N, ...] -> [num_segments, ...]."""
    data = _apply_mask(data, mask)
    if (jnp.issubdtype(data.dtype, jnp.floating)
            and _dense_ok(data.shape[0], num_segments)):
        return _segment_sum_dense(data, segment_ids, num_segments)
    return jax.ops.segment_sum(data, segment_ids,
                               num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


from functools import partial as _partial


def segment_broadcast(values: jnp.ndarray, segment_ids: jnp.ndarray,
                      num_segments: int) -> jnp.ndarray:
    """``values[segment_ids]`` with a scatter-free backward.

    Plain autodiff transposes the gather into an XLA scatter-add, which
    serializes on TPU (~36 us per site at bench shapes — the profiler
    showed ~250 us/step across the model's broadcast sites).  On the
    dense fast path the broadcast is instead written as an MXU matmul
    with the [N, S] one-hot assignment matrix: XLA transposes a
    dot_general into another dot_general, so BOTH directions are matmuls
    and no opaque custom-VJP boundary blocks fusion.  The one-hot build
    is batch-constant, so loop-invariant code motion hoists it out of
    scanned training steps.

    Semantics match ``values[segment_ids]`` exactly, including padding
    rows (whatever cotangent arrives at a padded row is accumulated into
    its segment, just as the scatter would — callers mask downstream, so
    those cotangents are zero).  ``num_segments`` must equal
    ``values.shape[0]``.
    """
    if (jnp.issubdtype(values.dtype, jnp.inexact)
            and _dense_ok(segment_ids.shape[0], num_segments)):
        # clip like jnp.take's default out-of-bounds mode so both paths
        # agree on out-of-range ids (they pick the edge row)
        cids = jnp.clip(segment_ids, 0, num_segments - 1)
        iota = jax.lax.iota(jnp.int32, num_segments)
        oh = (cids[:, None] == iota[None, :]).astype(values.dtype)
        flat = values.reshape(num_segments, -1)
        # HIGH, not HIGHEST: exact-bf16 one-hot operand (see
        # _segment_sum_dense) — XLA transposes this dot's precision into
        # the backward dot unchanged.  NOTE this makes the broadcast a
        # ~1e-6-relative copy, not bit-exact (the data operand is split
        # to bf16 hi+lo); all consumers tolerate that (segment_softmax
        # subtracts an approximate max, which only shifts the exp range).
        out = jnp.matmul(oh, flat, precision=jax.lax.Precision.HIGH)
        return out.reshape(segment_ids.shape[:1] + values.shape[1:])
    return _segment_broadcast_take(values, segment_ids, num_segments)


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def _segment_broadcast_take(values: jnp.ndarray, segment_ids: jnp.ndarray,
                            num_segments: int) -> jnp.ndarray:
    """Gather fallback (large S*N): custom VJP routes the cotangent
    through :func:`segment_sum` instead of the gather's scatter
    transpose."""
    del num_segments
    return jnp.take(values, segment_ids, axis=0, mode="clip")


def _segment_broadcast_fwd(values, segment_ids, num_segments):
    return jnp.take(values, segment_ids, axis=0, mode="clip"), segment_ids


def _segment_broadcast_bwd(num_segments, segment_ids, g):
    # clip, matching the forward's take(mode="clip"): an out-of-range
    # row read the edge segment, so its cotangent flows back there
    cids = jnp.clip(segment_ids, 0, num_segments - 1)
    return (segment_sum(g, cids, num_segments), None)


_segment_broadcast_take.defvjp(_segment_broadcast_fwd,
                               _segment_broadcast_bwd)


def broadcast(values: jnp.ndarray, segment_ids: jnp.ndarray) -> jnp.ndarray:
    """``segment_broadcast`` with ``num_segments`` taken from ``values``."""
    return segment_broadcast(values, segment_ids, values.shape[0])


def segment_count(segment_ids: jnp.ndarray,
                  num_segments: int,
                  mask: Optional[jnp.ndarray] = None,
                  indices_are_sorted: bool = True) -> jnp.ndarray:
    ones = jnp.ones(segment_ids.shape, dtype=jnp.float32)
    return segment_sum(ones, segment_ids, num_segments, mask,
                       indices_are_sorted)


def segment_mean(data: jnp.ndarray,
                 segment_ids: jnp.ndarray,
                 num_segments: int,
                 mask: Optional[jnp.ndarray] = None,
                 indices_are_sorted: bool = True) -> jnp.ndarray:
    total = segment_sum(data, segment_ids, num_segments, mask,
                        indices_are_sorted)
    count = segment_count(segment_ids, num_segments, mask, indices_are_sorted)
    count = jnp.maximum(count, 1.0)
    return total / count.reshape(count.shape + (1,) * (data.ndim - 1))


def segment_std_mean(data: jnp.ndarray,
                     segment_ids: jnp.ndarray,
                     num_segments: int,
                     mask: Optional[jnp.ndarray] = None,
                     ddof: int = 1,
                     indices_are_sorted: bool = True):
    """Per-segment (std, mean) matching ``torch.std_mean(x, dim=0)``
    (unbiased, ddof=1 — reference models.py:647).

    Single-element segments get std 0 (torch yields NaN there; we clamp the
    denominator, documented deviation — NaNs would poison training).
    """
    mean = segment_mean(data, segment_ids, num_segments, mask,
                        indices_are_sorted)
    centered = data - segment_broadcast(mean, segment_ids, num_segments)
    sq = segment_sum(centered * centered, segment_ids, num_segments, mask,
                     indices_are_sorted)
    count = segment_count(segment_ids, num_segments, mask, indices_are_sorted)
    denom = jnp.maximum(count - ddof, 1.0)
    var = sq / denom.reshape(denom.shape + (1,) * (data.ndim - 1))
    return jnp.sqrt(var), mean


def segment_max(data: jnp.ndarray,
                segment_ids: jnp.ndarray,
                num_segments: int,
                mask: Optional[jnp.ndarray] = None,
                indices_are_sorted: bool = True) -> jnp.ndarray:
    neg_inf = jnp.asarray(-jnp.inf, dtype=data.dtype)
    if data.ndim == 1 and _dense_ok(data.shape[0], num_segments):
        valid = segment_ids[None, :] == jax.lax.iota(
            jnp.int32, num_segments)[:, None]
        if mask is not None:
            valid = jnp.logical_and(valid, mask[None, :])
        mat = jnp.where(valid, data[None, :], neg_inf)   # [S, N]
        return mat.max(axis=1)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (data.ndim - 1))
        data = jnp.where(m, data, neg_inf)
    return jax.ops.segment_max(data, segment_ids,
                               num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_softmax(logits: jnp.ndarray,
                    segment_ids: jnp.ndarray,
                    num_segments: int,
                    mask: Optional[jnp.ndarray] = None,
                    indices_are_sorted: bool = True) -> jnp.ndarray:
    """Numerically-stable per-segment softmax (the reference's per-graph
    ``F.softmax(dim=0)`` at models.py:746).  Masked entries get weight 0.
    """
    seg_max = segment_max(logits, segment_ids, num_segments, mask,
                          indices_are_sorted)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    if mask is not None:
        # mask BEFORE exp: padded rows carry logit 0 under segment id 0,
        # so when the real logits are very negative, 0 - seg_max is a
        # large positive shift and exp overflows to inf — then the
        # post-exp mask multiply turns inf * 0 into NaN.  exp(-inf) = 0
        # keeps value and gradient clean.
        logits = jnp.where(mask, logits, -jnp.inf)
    shifted = logits - segment_broadcast(seg_max, segment_ids, num_segments)
    e = jnp.exp(shifted)
    denom = segment_sum(e, segment_ids, num_segments, None,
                        indices_are_sorted)
    denom = jnp.maximum(denom, 1e-16)
    return e / segment_broadcast(denom, segment_ids, num_segments)


def segment_normalize_exp(scores: jnp.ndarray,
                          segment_ids: jnp.ndarray,
                          num_segments: int,
                          mask: Optional[jnp.ndarray] = None,
                          clamp: float = 5.0,
                          eps: float = 1e-6,
                          indices_are_sorted: bool = True) -> jnp.ndarray:
    """The reference graph-transformer's *unshifted* edge softmax:
    ``exp(clamp(score, -5, 5))`` then divide by the per-destination sum plus
    eps (models.py:899, 917).  Kept bit-faithful rather than max-shifted.
    """
    e = jnp.exp(jnp.clip(scores, -clamp, clamp))
    e = _apply_mask(e, mask)
    z = segment_sum(e, segment_ids, num_segments, None, indices_are_sorted)
    return e / segment_broadcast(z + eps, segment_ids, num_segments)
