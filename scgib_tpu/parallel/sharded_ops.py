"""Global segment ops over a node-sharded mesh axis.

These are the cross-shard counterparts of ``ops/segment.py`` for the
node-sharded (CP-analog) training path (SURVEY.md §2.5, §7.3 "multi-host
graph partitioning"): node features live split over the mesh, graph
segments may SPAN shards, and every per-graph reduction becomes

    local partial segment op  ->  psum / pmax over the mesh axis

yielding a replicated [G_total, ...] result on every shard.  All functions
are called INSIDE shard_map with shard-local data and GLOBAL segment ids.

``ring_sddmm_sum`` is the sharded form of the reconstruction loss's
per-edge dot term (losses.recon_adj_loss): sender rows are fetched with
the same bidirectional ppermute ring as ``ring_partitioned_spmm``
(edge_partition.py), so the loss never gathers the full node set.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.segment import segment_broadcast, segment_max, segment_sum


def gseg_sum(data: jnp.ndarray, segment_ids: jnp.ndarray,
             num_segments: int, axis_name: str,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Cross-shard segment sum: [N/S, ...] local rows with global segment
    ids -> replicated [num_segments, ...]."""
    part = segment_sum(data, segment_ids, num_segments, mask=mask,
                       indices_are_sorted=True)
    return jax.lax.psum(part, axis_name)


def gseg_count(segment_ids: jnp.ndarray, num_segments: int, axis_name: str,
               mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    ones = jnp.ones(segment_ids.shape, jnp.float32)
    return gseg_sum(ones, segment_ids, num_segments, axis_name, mask)


def gseg_mean(data: jnp.ndarray, segment_ids: jnp.ndarray,
              num_segments: int, axis_name: str,
              mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    total = gseg_sum(data, segment_ids, num_segments, axis_name, mask)
    count = gseg_count(segment_ids, num_segments, axis_name, mask)
    count = jnp.maximum(count, 1.0)
    return total / count.reshape(count.shape + (1,) * (data.ndim - 1))


def gseg_std_mean(data: jnp.ndarray, segment_ids: jnp.ndarray,
                  num_segments: int, axis_name: str,
                  mask: Optional[jnp.ndarray] = None, ddof: int = 1):
    """Cross-shard (std, mean) per segment, matching
    ``ops.segment.segment_std_mean`` (torch.std_mean ddof=1 semantics,
    models.py:647) exactly on the union batch."""
    mean = gseg_mean(data, segment_ids, num_segments, axis_name, mask)
    centered = data - segment_broadcast(mean, segment_ids, num_segments)
    sq = gseg_sum(centered * centered, segment_ids, num_segments,
                  axis_name, mask)
    count = gseg_count(segment_ids, num_segments, axis_name, mask)
    denom = jnp.maximum(count - ddof, 1.0)
    var = sq / denom.reshape(denom.shape + (1,) * (data.ndim - 1))
    return jnp.sqrt(var), mean


def gseg_max(data: jnp.ndarray, segment_ids: jnp.ndarray,
             num_segments: int, axis_name: str,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    part = segment_max(data, segment_ids, num_segments, mask=mask,
                       indices_are_sorted=True)
    return jax.lax.pmax(part, axis_name)


def gseg_softmax(logits: jnp.ndarray, segment_ids: jnp.ndarray,
                 num_segments: int, axis_name: str,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Cross-shard per-segment softmax over nodes (the sharded form of the
    core<->candidate attention softmax, models.py:746): global per-segment
    max shift, global denominator, per-local-node weights."""
    seg_max = gseg_max(jax.lax.stop_gradient(logits), segment_ids,
                       num_segments, axis_name, mask)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    # the max shift is a per-segment constant: stopping its gradient is
    # exact for softmax and avoids differentiating through lax.pmax
    if mask is not None:
        # mask BEFORE exp (see ops.segment.segment_softmax): padded rows
        # would otherwise overflow exp and poison the sum with inf * 0
        logits = jnp.where(mask, logits, -jnp.inf)
    shifted = logits - segment_broadcast(seg_max, segment_ids,
                                          num_segments)
    e = jnp.exp(shifted)
    denom = gseg_sum(e, segment_ids, num_segments, axis_name)
    denom = jnp.maximum(denom, 1e-16)
    return e / segment_broadcast(denom, segment_ids, num_segments)


def ring_sddmm_sum(x: jnp.ndarray,
                   senders_owner_local: jnp.ndarray,
                   receivers_local: jnp.ndarray,
                   edge_mask: jnp.ndarray,
                   radius: int,
                   axis_name: str) -> jnp.ndarray:
    """Sum over this shard's (receiver-owned) edges of
    ``dot(x[sender], x[receiver])`` with sender rows living on other shards.

    Same ring-slot convention as ``ring_partitioned_spmm``
    (edge_partition.py): plan arrays are [2R+1, Ecap] shard-local slices;
    slot ``radius - d`` holds offset ``-d`` edges whose sender block arrives
    after d forward hops, slot ``radius + d`` after d backward hops.
    Returns the LOCAL scalar (sum of shard scalars == union-graph SDDMM sum).
    """
    size = jax.lax.axis_size(axis_name)

    def acc(block, slot):
        s_rows = jnp.take(block, senders_owner_local[slot], axis=0)
        r_rows = jnp.take(x, receivers_local[slot], axis=0)
        dots = jnp.sum(s_rows * r_rows, axis=-1)
        return jnp.sum(dots * edge_mask[slot].astype(dots.dtype))

    out = acc(x, radius)                       # offset 0: internal edges
    fwd = x
    bwd = x
    for d in range(1, radius + 1):
        fwd = jax.lax.ppermute(
            fwd, axis_name, [(i, (i + 1) % size) for i in range(size)])
        out = out + acc(fwd, radius - d)       # offset -d edges
        bwd = jax.lax.ppermute(
            bwd, axis_name, [(i, (i - 1) % size) for i in range(size)])
        out = out + acc(bwd, radius + d)       # offset +d edges
    return out
