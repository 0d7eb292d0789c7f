"""Sorted-segment pooling as banded MXU matmuls.

The candidate-embedding reduction ``cand[v] = sum_{i: center[i]=v} h[i]``
(reference ``dgl.sum_nodes`` over every ego-net, models.py:724-725) maps
16384 sub-node rows onto 4096 center nodes.  ``jax.ops.segment_sum``
lowers that to an XLA scatter-add, which serializes on TPU (~140 us/step
at bench shapes), and the dense one-hot trick of ``ops.segment`` is
unaffordable here (a [4096, 16384] one-hot).

Because the packer emits sub-nodes sorted by center (pack_subgraphs), the
pooling matrix P  [num_segments, S] is *banded*: the rows owned by one
tile of ``tile`` consecutive centers occupy one contiguous window of sub
rows.  Building per-tile dense [tile, window] blocks turns the reduction
into the same per-tile MXU matmul as ``ops.spmm_banded`` — and the
backward of a segment sum is a plain gather (``g[center]``), no scatter
anywhere.

The block build depends only on the batch's index arrays, so inside a
scanned training step XLA hoists it out of the loop (loop-invariant code
motion — verified in profiles: the adjacency block build amortizes to
~0.2 instances/step).  A ``lax.cond`` falls back to the scatter path at
runtime when the batch is too skewed for the static window (one center
tile owning more than ``window`` sub rows).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .segment import _apply_mask
from ..utils.knobs import env_flag as _env_flag


@partial(jax.custom_vjp, nondiff_argnums=())
def _pool_matmul(blocks, col_off, data, cc_clip):
    """[T, tile, W] @ windows of data -> [T*tile, d]; bwd is a gather.

    TPU: a Pallas kernel (pallas/banded.py::pool_banded_pallas) — VMEM
    window slicing (no staged [T, W, d] copy), bf16 block reads, and a
    hi/lo 2-pass product that equals precision=HIGH when one operand is
    bf16-exact.  Replaced the XLA composition that profiled ~250 us/step
    at bench shapes (round 4); parity ~1e-6 vs the exact scatter.

    Elsewhere (CPU tests, TPU fallback for huge data): the XLA banded
    dot at precision=HIGH — this is a segment SUM (a statistic), not a
    learned matmul, and the scatter path it replaces is exact f32."""
    import os as _os

    import jax as _jax

    if (_jax.default_backend() == "tpu" and data.ndim == 2
            and data.size * 4 <= (32 << 20)
            and _env_flag("SCGIB_POOL_PALLAS")):
        from .pallas.banded import pool_banded_pallas

        return pool_banded_pallas(blocks, col_off, data)
    from .spmm_banded import _banded_spmm_impl

    return _banded_spmm_impl(blocks, col_off, data,
                             precision=jax.lax.Precision.HIGH)


def _pool_matmul_fwd(blocks, col_off, data, cc_clip):
    return _pool_matmul(blocks, col_off, data, cc_clip), cc_clip


def _pool_matmul_bwd(cc_clip, g):
    # d/d data of sum-over-segment is g[center].  Rows whose cotangent
    # must be zero (padding) are handled by the caller's mask multiply on
    # ``data`` (its own VJP zeroes them).  blocks/col_off/cc carry no
    # gradient (0/1 weights from boolean masks, integer offsets).
    return (None, None, jnp.take(g, cc_clip, axis=0, mode="clip"), None)


_pool_matmul.defvjp(_pool_matmul_fwd, _pool_matmul_bwd)


def sorted_segment_sum_banded(data: jnp.ndarray,
                              segment_ids: jnp.ndarray,
                              num_segments: int,
                              mask: Optional[jnp.ndarray] = None,
                              tile: int = 128,
                              window: Optional[int] = None) -> jnp.ndarray:
    """Masked segment sum for SORTED segment ids via banded matmuls.

    data: [S, d] -> [num_segments, d].  Requires segment_ids ascending
    over real (mask=True) rows — the pack_subgraphs layout.  Falls back
    to ``jax.ops.segment_sum`` under ``lax.cond`` when the data is too
    skewed for the static window (result is identical either way).
    """
    s_rows = data.shape[0]
    if window is None:
        # 2x headroom over the average sub-rows-per-tile
        window = max(256, min(s_rows,
                              2 * tile * ((s_rows + num_segments - 1)
                                          // num_segments)))
        window = ((window + 255) // 256) * 256
    if (num_segments % tile != 0 or s_rows < window
            or s_rows % 64 != 0 or window % 64 != 0
            or data.ndim != 2):
        return _fallback(data, segment_ids, num_segments, mask)

    n_tiles = num_segments // tile
    m = (mask if mask is not None
         else jnp.ones(segment_ids.shape, jnp.bool_))
    # clipped ids: padding rows sort past every real center
    cc = jnp.where(m, segment_ids, num_segments).astype(jnp.int32)
    tile_starts = jnp.arange(n_tiles + 1, dtype=jnp.int32) * tile
    bounds = jnp.searchsorted(cc, tile_starts)            # [T+1]
    off = (bounds[:-1] // 64) * 64    # 64-aligned: the Pallas kernel's
    off = jnp.minimum(off, max(s_rows - window, 0)).astype(jnp.int32)
    # bf16 window slices need sublane-aligned starts (s_rows and window
    # are multiples of 64 by the bucket/window rounding, so the clamp
    # preserves alignment)
    span = bounds[1:] - off
    fits = jnp.max(span) <= window

    # per-row block coordinates (build is loop-invariant -> hoisted).
    # bf16 blocks: each sub-row owns exactly ONE (tile, row, col) slot,
    # so entries are 0/1 — bf16-exact at half the HBM read of f32.
    cc_clip = jnp.minimum(cc, num_segments - 1)
    t_idx = cc_clip // tile
    row = cc_clip - t_idx * tile
    col = jnp.arange(s_rows, dtype=jnp.int32) - off[t_idx]
    w = m.astype(jnp.bfloat16)
    blocks = jnp.zeros((n_tiles, tile, window), jnp.bfloat16)
    blocks = blocks.at[t_idx, row, col].add(w, mode="drop")

    data_m = _apply_mask(data, mask)

    def banded(d):
        return _pool_matmul(blocks, off, d, cc_clip)

    def scatter(d):
        # cc, not the raw segment_ids: the packer resets padding-row
        # centers to 0 AFTER the ascending real ids (batching.py), so the
        # raw array is NOT sorted and an incorrect indices_are_sorted hint
        # is implementation-defined for XLA scatter (ADVICE round 3).  cc
        # maps padding past the last segment — genuinely sorted, and the
        # out-of-range rows are dropped exactly like the masked rows.
        return jax.ops.segment_sum(d, cc,
                                   num_segments=num_segments,
                                   indices_are_sorted=True)

    return jax.lax.cond(fits, banded, scatter, data_m)


def _fallback(data, segment_ids, num_segments, mask):
    data = _apply_mask(data, mask)
    if mask is not None:
        # remap padding rows past the last segment so the sortedness hint
        # is actually true (see the cond's scatter branch above)
        ids = jnp.where(mask, segment_ids, num_segments).astype(jnp.int32)
    else:
        ids = segment_ids
    return jax.ops.segment_sum(data, ids,
                               num_segments=num_segments,
                               indices_are_sorted=True)
