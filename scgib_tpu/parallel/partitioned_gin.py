"""Edge-partitioned GIN encoder — message passing sharded ACROSS devices.

This is the training-path integration of the CP-analog machinery
(SURVEY.md §2.5/§7.1 step 8): for graphs too large for one device's batch
slot, node features live sharded over the mesh and every GIN conv runs

    agg_local = ring_partitioned_spmm(h_local, ...)   # ppermute halo
    h_local   = relu(syncBN(MLP(h_local + agg_local)))

entirely on the shard, with cross-shard traffic limited to the 2R
neighbor blocks of the bidirectional ring (R=1 for contiguously packed
batches) and the [F]-sized psums of sync-BatchNorm.

Parameter structure is IDENTICAL to ``models.encoders.GIN`` (conv{i}:
MLP2, bn{i}: MaskedBatchNorm), so one set of variables drives the
single-device, banded, Pallas-fused, and edge-partitioned paths — and the
partitioned forward is proven equal to the single-device encoder on the
union graph in BOTH train mode (sync-BN statistics psum over shards) and
eval mode (tests/test_edge_partition.py).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..models.layers import MLP2, MaskedBatchNorm
from .edge_partition import ring_partitioned_spmm


class PartitionedGIN(nn.Module):
    """GIN over a node-sharded graph, called INSIDE shard_map.

    Inputs (all shard-local; plan arrays from ``partition_edges_ring``
    with the shard axis already split by shard_map):
      h:            [N/S, d]       this shard's node features
      senders_owner_local: [2R+1, Ecap] sender index within owner shard
      receivers_local:     [2R+1, Ecap] receiver index within this shard
      edge_mask:           [2R+1, Ecap]
      node_mask:    [N/S] or None
    """

    hidden: int = 64
    num_convs: int = 4
    radius: int = 1
    axis_name: str = "data"

    @nn.compact
    def __call__(self, h, senders_owner_local, receivers_local, edge_mask,
                 *, node_mask=None, train: bool = True):
        if node_mask is not None:
            h = h * node_mask.astype(h.dtype)[:, None]
        for i in range(self.num_convs):
            agg = ring_partitioned_spmm(h, senders_owner_local,
                                        receivers_local, edge_mask,
                                        self.radius, self.axis_name)
            h = MLP2(self.hidden, self.hidden, name=f"conv{i}")(h + agg)
            h = MaskedBatchNorm(name=f"bn{i}", axis_name=self.axis_name)(
                h, node_mask, train=train)
            h = nn.relu(h)
            if node_mask is not None:
                h = h * node_mask.astype(h.dtype)[:, None]
        return h
