"""Node-sharded batch container + host-side resharding.

Takes an already-packed union ``GraphBatch``/``SubgraphBatch`` (the exact
arrays a single device would train on) and splits it into per-shard slices
for the full-model node-sharded pretrain step (sharded_scgib.py):

* nodes: contiguous equal ranges, one per shard (graphs MAY span shards —
  all per-graph reductions go through the psum'd global segment ops),
* graph edges: the bidirectional-ring plan of ``partition_edges_ring``,
* ego-net sub-nodes: each ego-net follows its CENTER node's shard, so
  Encoder2 and the candidate segment-sum are fully shard-local
  (sub-edges never cross shards by construction — every endpoint of a
  sub-edge belongs to the same ego-net),
* graph ownership: each real graph is "owned" by the shard holding its
  first node — the disjoint cover used for local-numerator loss terms.

All leaves carry a leading shard axis [S, ...] so the whole pytree is
shard_map'd with one ``P('data')`` spec.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..graph.container import GraphBatch, SubgraphBatch
from .edge_partition import partition_edges_ring


@struct.dataclass
class ShardedPretrainBatch:
    """Per-shard slices of one union batch; every leaf is [S, ...]."""

    # graph-batch node slices (P = nodes per shard)
    node_feat: jnp.ndarray          # [S, P, F]
    node_graph: jnp.ndarray         # [S, P] GLOBAL graph ids
    node_mask: jnp.ndarray          # [S, P]
    # ring edge plan (edge_partition.RingPartition, shard-leading)
    senders_owner_local: jnp.ndarray   # [S, 2R+1, E]
    receivers_local: jnp.ndarray       # [S, 2R+1, E]
    edge_mask: jnp.ndarray             # [S, 2R+1, E]
    # global graph masks (graph_mask identical on every shard; graph_own
    # is this shard's disjoint ownership slice)
    graph_mask: jnp.ndarray         # [S, G]
    graph_own: jnp.ndarray          # [S, G]
    # shard-local ego-net batch (Q = sub-node cap, Qe = sub-edge cap)
    sub_node_feat: jnp.ndarray      # [S, Q, F]
    sub_center_local: jnp.ndarray   # [S, Q] center index within shard range
    sub_node_mask: jnp.ndarray      # [S, Q]
    sub_senders: jnp.ndarray        # [S, Qe] shard-local sub-node ids
    sub_receivers: jnp.ndarray      # [S, Qe] sorted ascending
    sub_edge_mask: jnp.ndarray      # [S, Qe]
    radius: int = struct.field(pytree_node=False, default=1)

    @property
    def num_shards(self) -> int:
        return self.node_feat.shape[0]

    @property
    def nodes_per_shard(self) -> int:
        return self.node_feat.shape[1]

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[-1]


def _round_up(x: int, m: int) -> int:
    return max(m, ((x + m - 1) // m) * m)


def shard_pretrain_batch(g: GraphBatch, sub: SubgraphBatch,
                         num_shards: int,
                         sub_node_cap: Optional[int] = None,
                         sub_edge_cap: Optional[int] = None
                         ) -> ShardedPretrainBatch:
    """Reshard a packed union batch into per-shard slices (host, NumPy).

    ``g.num_nodes`` must be divisible by ``num_shards`` (pad the node
    capacity to a shard multiple when packing).  Per-shard sub-node/edge
    capacities default to the observed max, rounded up to 8/32.
    """
    n = g.num_nodes
    if n % num_shards != 0:
        raise ValueError(f"node capacity {n} not divisible by "
                         f"{num_shards} shards")
    per = n // num_shards
    feat = np.asarray(g.node_feat)
    node_graph = np.asarray(g.node_graph)
    node_mask = np.asarray(g.node_mask)
    graph_mask = np.asarray(g.graph_mask)
    num_graphs = graph_mask.shape[0]

    # --- ring plan over the real graph edges -----------------------------
    em = np.asarray(g.edge_mask)
    plan = partition_edges_ring(np.asarray(g.senders)[em],
                                np.asarray(g.receivers)[em], n, num_shards)
    # [2R+1, S, E] -> [S, 2R+1, E]
    sol = np.transpose(plan.senders_owner_local, (1, 0, 2))
    rl = np.transpose(plan.receivers_local, (1, 0, 2))
    pem = np.transpose(plan.edge_mask, (1, 0, 2))

    # --- graph ownership: shard of the graph's first real node -----------
    own = np.zeros((num_shards, num_graphs), dtype=bool)
    first = np.full(num_graphs, n, dtype=np.int64)
    idx = np.nonzero(node_mask)[0]
    np.minimum.at(first, node_graph[idx], idx)
    for gi in range(num_graphs):
        if graph_mask[gi]:
            own[min(int(first[gi]) // per, num_shards - 1), gi] = True

    # --- ego-nets follow their center's shard -----------------------------
    centers = np.asarray(sub.node_center)
    sub_mask = np.asarray(sub.node_mask)
    sub_orig = np.asarray(sub.node_orig)
    if sub.node_feat is not None:
        sub_feat_union = np.asarray(sub.node_feat)
    else:
        sub_feat_union = feat[sub_orig]   # host-side gather of the wire fmt
    s_send = np.asarray(sub.senders)
    s_recv = np.asarray(sub.receivers)
    s_emask = np.asarray(sub.edge_mask)

    shard_of_sub = np.where(sub_mask, centers // per, -1)
    real_edges = np.nonzero(s_emask)[0]
    # every sub-edge joins two members of one ego-net -> same shard
    edge_shard = shard_of_sub[s_recv[real_edges]]

    q_counts = [int(np.sum(shard_of_sub == s)) for s in range(num_shards)]
    qe_counts = [int(np.sum(edge_shard == s)) for s in range(num_shards)]
    q_cap = sub_node_cap or _round_up(max(q_counts + [1]), 8)
    qe_cap = sub_edge_cap or _round_up(max(qe_counts + [1]), 32)
    if max(q_counts) > q_cap:
        raise ValueError(f"sub_node_cap {q_cap} < shard load "
                         f"{max(q_counts)}")
    if max(qe_counts) > qe_cap:
        raise ValueError(f"sub_edge_cap {qe_cap} < shard load "
                         f"{max(qe_counts)}")

    fdim = feat.shape[1]
    sub_feat = np.zeros((num_shards, q_cap, fdim), np.float32)
    sub_cl = np.zeros((num_shards, q_cap), np.int32)
    sub_nm = np.zeros((num_shards, q_cap), bool)
    sub_s = np.zeros((num_shards, qe_cap), np.int32)
    sub_r = np.zeros((num_shards, qe_cap), np.int32)
    sub_em = np.zeros((num_shards, qe_cap), bool)
    for s in range(num_shards):
        sel = np.nonzero(shard_of_sub == s)[0]
        k = len(sel)
        remap = np.full(sub_mask.shape[0], -1, np.int64)
        remap[sel] = np.arange(k)
        sub_feat[s, :k] = sub_feat_union[sel]
        sub_cl[s, :k] = centers[sel] - s * per
        sub_nm[s, :k] = True
        esel = real_edges[edge_shard == s]
        ke = len(esel)
        ls = remap[s_send[esel]]
        lr = remap[s_recv[esel]]
        assert (ls >= 0).all() and (lr >= 0).all(), \
            "sub-edge endpoint missing from its shard's ego-nets"
        order = np.lexsort((ls, lr))        # sort by local receiver
        sub_s[s, :ke] = ls[order]
        sub_r[s, :ke] = lr[order]
        sub_em[s, :ke] = True

    tile = lambda a: np.broadcast_to(a, (num_shards,) + a.shape).copy()
    return ShardedPretrainBatch(
        node_feat=jnp.asarray(feat.reshape(num_shards, per, fdim)),
        node_graph=jnp.asarray(node_graph.reshape(num_shards, per)),
        node_mask=jnp.asarray(node_mask.reshape(num_shards, per)),
        senders_owner_local=jnp.asarray(sol),
        receivers_local=jnp.asarray(rl),
        edge_mask=jnp.asarray(pem),
        graph_mask=jnp.asarray(tile(graph_mask)),
        graph_own=jnp.asarray(own),
        sub_node_feat=jnp.asarray(sub_feat),
        sub_center_local=jnp.asarray(sub_cl),
        sub_node_mask=jnp.asarray(sub_nm),
        sub_senders=jnp.asarray(sub_s),
        sub_receivers=jnp.asarray(sub_r),
        sub_edge_mask=jnp.asarray(sub_em),
        radius=plan.radius,
    )


def local_slice(batch: ShardedPretrainBatch) -> ShardedPretrainBatch:
    """Strip the leading shard axis (used inside shard_map)."""
    import jax

    leaves = jax.tree_util.tree_map(lambda x: x[0], batch)
    return leaves
