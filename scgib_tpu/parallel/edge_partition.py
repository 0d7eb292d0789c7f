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
