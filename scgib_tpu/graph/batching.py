"""Host-side graph packing — the replacement for ``dgl.batch`` + collate.

The reference collates a list of DGL graphs into one batched graph with
dynamic node/edge counts (``molecules.py:349-362``).  For TPU we pack into
fixed-capacity buffers (see ``container.py``) so that ``jit`` compiles once
per capacity bucket.

``pack_graphs``      packs a list of (edges, features[, label]) graphs.
``pack_subgraphs``   packs precomputed per-node ego-nets into a SubgraphBatch.
``BucketSpec``       rounds capacities up to a small set of bucket sizes to
                     bound the number of jit recompilations.

All of this is plain NumPy on the host; arrays are handed to JAX at the
device boundary (the analog of the reference's ``.to(device)`` copies at
``exp_pretraining.py:303``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .container import GraphBatch, SubgraphBatch


@dataclasses.dataclass(frozen=True)
class GraphData:
    """One host-side graph: COO edges (already symmetrized, deduped) and
    node features.  The analog of one DGL graph produced by
    ``util.load_dgl_fromPyG`` (util.py:277-325)."""

    senders: np.ndarray        # [E] int32
    receivers: np.ndarray      # [E] int32
    node_feat: np.ndarray      # [n, F] float32
    label: Optional[np.ndarray] = None   # [T] float (may contain NaN)

    @property
    def num_nodes(self) -> int:
        return self.node_feat.shape[0]

    @property
    def num_edges(self) -> int:
        return self.senders.shape[0]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class BucketSpec:
    """Capacity bucketing: capacities are rounded up to multiples so only a
    few distinct shapes (= jit cache entries) occur across batches."""

    node_multiple: int = 256
    edge_multiple: int = 512
    graph_multiple: int = 8

    def nodes(self, n: int) -> int:
        return max(self.node_multiple, _round_up(n, self.node_multiple))

    def edges(self, e: int) -> int:
        return max(self.edge_multiple, _round_up(e, self.edge_multiple))

    def graphs(self, g: int) -> int:
        return max(self.graph_multiple, _round_up(g, self.graph_multiple))


def symmetrize_edges(senders: np.ndarray,
                     receivers: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Make the edge list bidirectional and deduplicated — the behavior of
    ``dgl.to_bidirected`` used at util.py:318."""
    s = np.concatenate([senders, receivers]).astype(np.int64)
    r = np.concatenate([receivers, senders]).astype(np.int64)
    n = max(int(s.max(initial=-1)), int(r.max(initial=-1))) + 1 if len(s) else 0
    key = s * max(n, 1) + r
    _, idx = np.unique(key, return_index=True)
    return s[idx].astype(np.int32), r[idx].astype(np.int32)


def pack_graphs(graphs: Sequence[GraphData],
                num_nodes: int,
                num_edges: int,
                num_graphs: int,
                num_tasks: Optional[int] = None,
                banded: bool = True) -> GraphBatch:
    """Pack graphs into one padded GraphBatch with the given capacities.

    Edges are sorted by receiver (then sender) so device-side segment
    reductions take the sorted path.  Raises if capacities are exceeded.
    ``banded=True`` additionally emits the block-dense banded adjacency
    (graph/banded.py) when every graph fits the band — the GIN MXU fast
    path; silently omitted otherwise."""
    total_n = sum(g.num_nodes for g in graphs)
    total_e = sum(g.num_edges for g in graphs)
    if total_n > num_nodes:
        raise ValueError(f"node capacity {num_nodes} < required {total_n}")
    if total_e > num_edges:
        raise ValueError(f"edge capacity {num_edges} < required {total_e}")
    if len(graphs) > num_graphs:
        raise ValueError(f"graph capacity {num_graphs} < {len(graphs)}")

    feat_dim = graphs[0].node_feat.shape[1]
    node_feat = np.zeros((num_nodes, feat_dim), dtype=np.float32)
    node_graph = np.zeros(num_nodes, dtype=np.int32)
    node_mask = np.zeros(num_nodes, dtype=bool)
    senders = np.zeros(num_edges, dtype=np.int32)
    receivers = np.zeros(num_edges, dtype=np.int32)
    edge_mask = np.zeros(num_edges, dtype=bool)
    graph_mask = np.zeros(num_graphs, dtype=bool)

    has_labels = any(g.label is not None for g in graphs)
    if num_tasks is None and has_labels:
        num_tasks = max(np.atleast_1d(g.label).shape[0]
                        for g in graphs if g.label is not None)
    labels = label_mask = None
    if num_tasks:
        labels = np.zeros((num_graphs, num_tasks), dtype=np.float32)
        label_mask = np.zeros((num_graphs, num_tasks), dtype=bool)

    n_off = 0
    e_off = 0
    for gi, g in enumerate(graphs):
        n, e = g.num_nodes, g.num_edges
        node_feat[n_off:n_off + n] = g.node_feat
        node_graph[n_off:n_off + n] = gi
        node_mask[n_off:n_off + n] = True
        senders[e_off:e_off + e] = g.senders + n_off
        receivers[e_off:e_off + e] = g.receivers + n_off
        edge_mask[e_off:e_off + e] = True
        graph_mask[gi] = True
        if labels is not None and g.label is not None:
            lab = np.atleast_1d(np.asarray(g.label, dtype=np.float32))
            labels[gi, :lab.shape[0]] = np.nan_to_num(lab, nan=0.0)
            label_mask[gi, :lab.shape[0]] = ~np.isnan(lab)
        n_off += n
        e_off += e

    # Padding nodes keep graph id 0 (masked); padding edges self-loop on the
    # last padding node so they never alias a real node's accumulator slot.
    pad_node = num_nodes - 1 if n_off < num_nodes else 0
    senders[e_off:] = pad_node
    receivers[e_off:] = pad_node

    order = np.lexsort((senders, receivers))
    senders = senders[order]
    receivers = receivers[order]
    edge_mask = edge_mask[order]

    band_blocks = band_col_off = None
    if banded:
        band_blocks, band_col_off = _try_banded(senders, receivers,
                                                edge_mask, num_nodes)

    return GraphBatch(
        node_feat=node_feat, node_graph=node_graph, node_mask=node_mask,
        senders=senders, receivers=receivers, edge_mask=edge_mask,
        graph_mask=graph_mask, labels=labels, label_mask=label_mask,
        band_blocks=band_blocks, band_col_off=band_col_off)


def _try_banded(senders, receivers, edge_mask, num_nodes,
                tile: int = 128, band: int = 256):
    from .banded import pack_banded

    if num_nodes % tile != 0 or num_nodes < band:
        return None, None
    try:
        b = pack_banded(senders, receivers, edge_mask, num_nodes, tile,
                        band)
    except ValueError:
        return None, None
    return b.blocks, b.col_off


@dataclasses.dataclass(frozen=True)
class EgoNets:
    """Precomputed k-hop ego-nets for one graph (see egonet.py).

    ``node_lists[v]`` — original node ids in v's ego-net (v first).
    ``edge_lists[v]`` — (senders, receivers) local to node_lists[v].
    """

    node_lists: List[np.ndarray]
    edge_lists: List[Tuple[np.ndarray, np.ndarray]]


def pack_subgraphs(graphs: Sequence[GraphData],
                   egonets: Sequence[EgoNets],
                   num_sub_nodes: int,
                   num_sub_edges: int,
                   banded: bool = True) -> SubgraphBatch:
    """Flatten per-node ego-nets of a batch into one padded SubgraphBatch.

    Mirrors the reference's ``chain.from_iterable(batch_subgraphs)`` +
    ``dgl.batch`` flattening (train_moleculenetBACE.py:141-149): ego-nets are
    concatenated in (graph, node) order so segment ids equal the center
    node's global index in the packed GraphBatch.
    """
    total_s = sum(len(nl) for e in egonets for nl in e.node_lists)
    total_q = sum(len(el[0]) for e in egonets for el in e.edge_lists)
    if total_s > num_sub_nodes:
        raise ValueError(f"sub-node capacity {num_sub_nodes} < {total_s}")
    if total_q > num_sub_edges:
        raise ValueError(f"sub-edge capacity {num_sub_edges} < {total_q}")

    feat_dim = graphs[0].node_feat.shape[1]
    node_feat = np.zeros((num_sub_nodes, feat_dim), dtype=np.float32)
    node_center = np.zeros(num_sub_nodes, dtype=np.int32)
    node_orig = np.zeros(num_sub_nodes, dtype=np.int32)
    node_mask = np.zeros(num_sub_nodes, dtype=bool)
    senders = np.zeros(num_sub_edges, dtype=np.int32)
    receivers = np.zeros(num_sub_edges, dtype=np.int32)
    edge_mask = np.zeros(num_sub_edges, dtype=bool)

    s_off = 0
    q_off = 0
    n_off = 0   # global node offset of the current graph in the GraphBatch
    for g, ego in zip(graphs, egonets):
        for v, (nl, (es, er)) in enumerate(zip(ego.node_lists,
                                               ego.edge_lists)):
            m = len(nl)
            node_feat[s_off:s_off + m] = g.node_feat[nl]
            node_center[s_off:s_off + m] = n_off + v
            node_orig[s_off:s_off + m] = n_off + nl
            node_mask[s_off:s_off + m] = True
            q = len(es)
            senders[q_off:q_off + q] = es + s_off
            receivers[q_off:q_off + q] = er + s_off
            edge_mask[q_off:q_off + q] = True
            s_off += m
            q_off += q
        n_off += g.num_nodes

    pad_node = num_sub_nodes - 1 if s_off < num_sub_nodes else 0
    senders[q_off:] = pad_node
    receivers[q_off:] = pad_node
    # Padding sub-nodes must not collide with real center segments: point
    # them at the last center slot only if unused, else rely on the mask.
    node_center[s_off:] = 0

    order = np.lexsort((senders, receivers))
    senders = senders[order]
    receivers = receivers[order]
    edge_mask = edge_mask[order]
    band_blocks = band_col_off = None
    if banded:
        band_blocks, band_col_off = _try_banded(senders, receivers,
                                                edge_mask, num_sub_nodes)
    return SubgraphBatch(
        node_feat=node_feat, node_center=node_center, node_orig=node_orig,
        node_mask=node_mask, senders=senders,
        receivers=receivers, edge_mask=edge_mask,
        band_blocks=band_blocks, band_col_off=band_col_off)


def max_egonet_size(egonets: Sequence[EgoNets]) -> int:
    return max((len(nl) for e in egonets for nl in e.node_lists),
               default=1)


def pack_subgraphs_dense(graphs: Sequence[GraphData],
                         egonets: Sequence[EgoNets],
                         num_centers: int,
                         max_sub: int):
    """Pack per-node ego-nets into a DenseSubgraphBatch (one [max_sub]
    slot per center, dense within-ego adjacency blocks).  Center rows are
    aligned with the owning GraphBatch's global node ids.  Raises if an
    ego-net exceeds ``max_sub`` (choose the bucket from
    ``max_egonet_size``)."""
    from .container import DenseSubgraphBatch

    feat_dim = graphs[0].node_feat.shape[1]
    node_feat = np.zeros((num_centers, max_sub, feat_dim), np.float32)
    node_orig = np.zeros((num_centers, max_sub), np.int32)
    adj = np.zeros((num_centers, max_sub, max_sub), np.float32)
    mask = np.zeros((num_centers, max_sub), bool)

    n_off = 0
    for g, ego in zip(graphs, egonets):
        for v, (nl, (es, er)) in enumerate(zip(ego.node_lists,
                                               ego.edge_lists)):
            m = len(nl)
            if m > max_sub:
                raise ValueError(
                    f"ego-net size {m} exceeds max_sub {max_sub}")
            c = n_off + v
            node_feat[c, :m] = g.node_feat[nl]
            node_orig[c, :m] = n_off + np.asarray(nl)
            mask[c, :m] = True
            adj[c, es, er] = 1.0
        n_off += g.num_nodes
    if n_off > num_centers:
        raise ValueError(f"center capacity {num_centers} < {n_off}")

    return DenseSubgraphBatch(node_feat=node_feat, node_orig=node_orig,
                              adj=adj, mask=mask)
