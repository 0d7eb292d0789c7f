"""Edge-partitioned message passing — the graph analog of context/sequence
parallelism (SURVEY.md §2.5, §7.1 step 8).

For graphs too large for one device's batch slot, nodes are split into
contiguous ranges (one per mesh shard) and every edge is assigned to the
shard owning its RECEIVER.  Each shard stores its node-range features and
its edge list (global sender ids, shard-local receiver ids).  One
aggregation step is then

    h_all   = all_gather(h_local)            # boundary/halo exchange
    msgs    = h_all[senders_global]          # local gather
    agg     = segment_sum(msgs, recv_local)  # local scatter

The all_gather is the simple, always-correct halo exchange; because each
shard only reads sender rows it references, XLA's latency-hiding scheduler
overlaps it with the preceding local compute.  (A ppermute ring exchanging
only true boundary rows is the bandwidth-optimal refinement for very
large graphs; the layout here already confines cross-shard reads to the
band around range boundaries.)

``partitioned_spmm`` equals the single-device ``gather_sum`` on the union
graph exactly (tests/test_edge_partition.py).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.segment import segment_sum


@dataclasses.dataclass(frozen=True)
class EdgePartition:
    """Host-side plan: per-shard padded edge lists over contiguous node
    ranges.

    senders_global: [S, Ecap] int32 — sender's GLOBAL node id
    receivers_local: [S, Ecap] int32 — receiver's index within its shard
    edge_mask: [S, Ecap] bool
    nodes_per_shard: int
    """

    senders_global: np.ndarray
    receivers_local: np.ndarray
    edge_mask: np.ndarray
    nodes_per_shard: int

    @property
    def num_shards(self) -> int:
        return self.senders_global.shape[0]


def partition_edges(senders: np.ndarray, receivers: np.ndarray,
                    num_nodes: int, num_shards: int,
                    edge_cap: Optional[int] = None) -> EdgePartition:
    """Assign edges to the shard owning the receiver (contiguous equal
    node ranges); pad each shard's list to a common capacity."""
    assert num_nodes % num_shards == 0, \
        "pad node capacity to a shard multiple"
    per = num_nodes // num_shards
    shard = receivers // per
    counts = np.bincount(shard, minlength=num_shards)
    cap = int(counts.max()) if edge_cap is None else edge_cap
    cap = max(cap, 1)
    if counts.max() > cap:
        raise ValueError(f"edge_cap {cap} < max shard load {counts.max()}")

    sg = np.zeros((num_shards, cap), np.int32)
    rl = np.zeros((num_shards, cap), np.int32)
    em = np.zeros((num_shards, cap), bool)
    fill = np.zeros(num_shards, np.int64)
    for e in range(len(senders)):
        s = shard[e]
        i = fill[s]
        sg[s, i] = senders[e]
        rl[s, i] = receivers[e] - s * per
        em[s, i] = True
        fill[s] += 1
    return EdgePartition(senders_global=sg, receivers_local=rl,
                         edge_mask=em, nodes_per_shard=per)


def partitioned_spmm(h_local: jnp.ndarray,
                     senders_global: jnp.ndarray,
                     receivers_local: jnp.ndarray,
                     edge_mask: jnp.ndarray,
                     axis_name: str) -> jnp.ndarray:
    """Inside shard_map: neighbor sums for this shard's node range.
    ``h_local`` [N/S, d]; returns [N/S, d]."""
    h_all = jax.lax.all_gather(h_local, axis_name)      # [S, N/S, d]
    h_all = h_all.reshape(-1, h_local.shape[-1])        # [N, d]
    msgs = jnp.take(h_all, senders_global, axis=0)
    return segment_sum(msgs, receivers_local, h_local.shape[0],
                       mask=edge_mask, indices_are_sorted=False)


@dataclasses.dataclass(frozen=True)
class RingPartition:
    """Host-side plan for the ring halo exchange.

    Edges are grouped by the ring offset of their SENDER's shard relative
    to the receiver's shard: offset 0 edges are shard-internal, offset +d
    edges read rows owned by shard (s+d) mod S, offset -d by (s-d) mod S.
    For contiguously packed batches every cross-shard edge sits at a range
    boundary, so ``radius`` is 1 and each step ships exactly two [N/S, d]
    blocks per shard instead of all_gather's S-1 — the bandwidth-optimal
    halo promised in SURVEY.md §2.5/§5.

    Arrays are indexed [offset_slot, shard, Ecap_slot] where slot o maps
    to offset ``o - radius`` (so slot 0 is -radius, slot radius is 0).
    ``senders_owner_local`` holds the sender's index WITHIN ITS OWNER's
    shard range — after d ppermute steps the owner's block is resident
    locally and the gather is purely local.
    """

    senders_owner_local: np.ndarray   # [2R+1, S, Ecap] int32
    receivers_local: np.ndarray       # [2R+1, S, Ecap] int32
    edge_mask: np.ndarray             # [2R+1, S, Ecap] bool
    nodes_per_shard: int
    radius: int

    @property
    def num_shards(self) -> int:
        return self.senders_owner_local.shape[1]


def partition_edges_ring(senders: np.ndarray, receivers: np.ndarray,
                         num_nodes: int, num_shards: int) -> RingPartition:
    """Build the ring plan: group edges by signed ring distance from the
    receiver's shard to the sender's shard (shortest wraparound direction;
    ties at S/2 go to +S/2)."""
    assert num_nodes % num_shards == 0, \
        "pad node capacity to a shard multiple"
    per = num_nodes // num_shards
    s_shard = np.asarray(senders) // per
    r_shard = np.asarray(receivers) // per
    # signed shortest ring distance in (-S/2, S/2]
    diff = (s_shard - r_shard) % num_shards
    signed = np.where(diff > num_shards // 2, diff - num_shards, diff)
    radius = int(np.abs(signed).max(initial=0))

    slots = 2 * radius + 1
    caps = np.zeros(slots, np.int64)
    for o in range(slots):
        d = o - radius
        sel = signed == d
        if sel.any():
            caps[o] = np.bincount(r_shard[sel],
                                  minlength=num_shards).max()
    cap = max(int(caps.max()), 1)

    sol = np.zeros((slots, num_shards, cap), np.int32)
    rl = np.zeros((slots, num_shards, cap), np.int32)
    em = np.zeros((slots, num_shards, cap), bool)
    fill = np.zeros((slots, num_shards), np.int64)
    for e in range(len(senders)):
        o = int(signed[e]) + radius
        sh = int(r_shard[e])
        i = fill[o, sh]
        sol[o, sh, i] = senders[e] - s_shard[e] * per
        rl[o, sh, i] = receivers[e] - sh * per
        em[o, sh, i] = True
        fill[o, sh] += 1
    return RingPartition(senders_owner_local=sol, receivers_local=rl,
                         edge_mask=em, nodes_per_shard=per, radius=radius)


def ring_partitioned_spmm(h_local: jnp.ndarray,
                          senders_owner_local: jnp.ndarray,
                          receivers_local: jnp.ndarray,
                          edge_mask: jnp.ndarray,
                          radius: int,
                          axis_name: str) -> jnp.ndarray:
    """Inside shard_map: neighbor sums via a bidirectional ppermute ring.

    Plan arrays carry the shard-local [2R+1, Ecap] slices (shard_map has
    already split the shard axis).  Step d sends each shard's ORIGINAL
    block one hop further in both directions; after d hops the block owned
    by shard s∓d is resident and its offset ±d edges aggregate locally.
    Equals ``partitioned_spmm`` / the union-graph ``gather_sum`` exactly
    (tests/test_edge_partition.py); ships 2R blocks per shard instead of
    all_gather's S-1.
    """
    n_local = h_local.shape[0]
    size = jax.lax.axis_size(axis_name)

    def agg(block, slot):
        msgs = jnp.take(block, senders_owner_local[slot], axis=0)
        return segment_sum(msgs, receivers_local[slot], n_local,
                           mask=edge_mask[slot],
                           indices_are_sorted=False)

    out = agg(h_local, radius)                 # offset 0: internal edges
    fwd = h_local   # travels +1 each step: after d steps shard s holds s-d
    bwd = h_local   # travels -1 each step: after d steps shard s holds s+d
    for d in range(1, radius + 1):
        fwd = jax.lax.ppermute(
            fwd, axis_name,
            [(i, (i + 1) % size) for i in range(size)])
        out = out + agg(fwd, radius - d)       # offset -d edges
        bwd = jax.lax.ppermute(
            bwd, axis_name,
            [(i, (i - 1) % size) for i in range(size)])
        out = out + agg(bwd, radius + d)       # offset +d edges
    return out
