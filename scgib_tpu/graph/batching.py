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
                banded="device",
                gt_fits: Optional[bool] = None) -> GraphBatch:
    """Pack graphs into one padded GraphBatch with the given capacities.

    Edges are sorted by receiver (then sender) so device-side segment
    reductions take the sorted path.  Raises if capacities are exceeded.
    ``banded`` controls the block-dense banded adjacency layout: 'device'
    (default) ships only the tiny col_off and lets the model scatter the
    blocks on device; True/'host' builds them here; False disables
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
                                                edge_mask, num_nodes,
                                                mode=banded)

    if gt_fits is None:
        # gt_fits is a STATIC (jit-cache-key) flag; deriving it from the
        # current batch's max graph can flip between batches of one
        # dataset and retrace.  Callers with dataset context pass the
        # dataset-level value (loader.pack_batch, data/flat.py); this
        # per-batch fallback serves one-off/test callers (ADVICE round 4).
        from .banded import gt_band_fits
        gt_fits = gt_band_fits(max((g.num_nodes for g in graphs),
                                   default=0), num_nodes)
    gt_ok = gt_fits
    return GraphBatch(
        node_feat=node_feat, node_graph=node_graph, node_mask=node_mask,
        senders=senders, receivers=receivers, edge_mask=edge_mask,
        graph_mask=graph_mask, labels=labels, label_mask=label_mask,
        band_blocks=band_blocks, band_col_off=band_col_off,
        gt_fits=gt_ok)


def _try_banded(senders, receivers, edge_mask, num_nodes,
                tile: int = 128, band: int = 256, mode=True):
    """mode True/'host': build [T, tile, band] blocks here;
    mode 'device': only verify feasibility and return the tiny col_off —
    the model builds the blocks on device (banded.build_blocks_jax),
    saving the ~20 MB/batch host->device block upload."""
    from .banded import banded_col_off, fits_band_masked, pack_banded

    if num_nodes % tile != 0 or num_nodes < band:
        return None, None
    if mode == "device":
        if not fits_band_masked(senders, receivers, edge_mask, num_nodes,
                                tile, band):
            return None, None
        return None, banded_col_off(num_nodes, tile, band)
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

    ``flat()`` returns (and caches) the concatenated per-graph view the
    batch packer consumes — computing it once per graph amortizes the
    Python-loop flattening across epochs (it was the host-side hot loop:
    ~2.5k tiny slice assignments per 128-graph batch).
    """

    node_lists: List[np.ndarray]
    edge_lists: List[Tuple[np.ndarray, np.ndarray]]

    def flat(self) -> "FlatEgoNets":
        cached = getattr(self, "_flat", None)
        if cached is None:
            n = len(self.node_lists)
            node_off = np.zeros(n + 1, np.int64)
            edge_off = np.zeros(n + 1, np.int64)
            for v, nl in enumerate(self.node_lists):
                node_off[v + 1] = node_off[v] + len(nl)
                edge_off[v + 1] = edge_off[v] + len(self.edge_lists[v][0])
            nodes = (np.concatenate(self.node_lists).astype(np.int32)
                     if n else np.zeros(0, np.int32))
            if n and edge_off[-1]:
                es = np.concatenate([el[0] for el in self.edge_lists])
                er = np.concatenate([el[1] for el in self.edge_lists])
                # lift ego-local edge endpoints to graph-flat positions
                base = np.repeat(node_off[:-1], np.diff(edge_off))
                es = (es + base).astype(np.int32)
                er = (er + base).astype(np.int32)
            else:
                es = np.zeros(0, np.int32)
                er = np.zeros(0, np.int32)
            cached = FlatEgoNets(nodes=nodes, node_off=node_off,
                                 senders=es, receivers=er,
                                 edge_off=edge_off)
            object.__setattr__(self, "_flat", cached)
        return cached


@dataclasses.dataclass(frozen=True)
class FlatEgoNets:
    """Concatenated ego-nets of ONE graph, in center order.

    ``nodes``     [S]  original node id of each flattened sub-node
    ``node_off``  [n+1] sub-node offsets per center
    ``senders``/``receivers`` [Q] edges with graph-flat endpoints
    ``edge_off``  [n+1] edge offsets per center
    """

    nodes: np.ndarray
    node_off: np.ndarray
    senders: np.ndarray
    receivers: np.ndarray
    edge_off: np.ndarray


def pack_subgraphs(graphs: Sequence[GraphData],
                   egonets: Sequence[EgoNets],
                   num_sub_nodes: int,
                   num_sub_edges: int,
                   banded="device",
                   with_features: bool = False,
                   gt_fits: Optional[bool] = None) -> SubgraphBatch:
    """Flatten per-node ego-nets of a batch into one padded SubgraphBatch.

    Mirrors the reference's ``chain.from_iterable(batch_subgraphs)`` +
    ``dgl.batch`` flattening (train_moleculenetBACE.py:141-149): ego-nets are
    concatenated in (graph, node) order so segment ids equal the center
    node's global index in the packed GraphBatch.

    ``with_features=False`` (default) leaves ``node_feat=None`` — sub-node
    features are exactly ``g.node_feat[node_orig]`` and the models gather
    them on device, which removes the largest host->device array from the
    wire format.
    """
    flats = [e.flat() for e in egonets]
    total_s = int(sum(f.node_off[-1] for f in flats))
    total_q = int(sum(f.edge_off[-1] for f in flats))
    if total_s > num_sub_nodes:
        raise ValueError(f"sub-node capacity {num_sub_nodes} < {total_s}")
    if total_q > num_sub_edges:
        raise ValueError(f"sub-edge capacity {num_sub_edges} < {total_q}")

    feat_dim = graphs[0].node_feat.shape[1]
    node_feat = (np.zeros((num_sub_nodes, feat_dim), dtype=np.float32)
                 if with_features else None)
    node_center = np.zeros(num_sub_nodes, dtype=np.int32)
    node_orig = np.zeros(num_sub_nodes, dtype=np.int32)
    node_mask = np.zeros(num_sub_nodes, dtype=bool)
    senders = np.zeros(num_sub_edges, dtype=np.int32)
    receivers = np.zeros(num_sub_edges, dtype=np.int32)
    edge_mask = np.zeros(num_sub_edges, dtype=bool)

    s_off = 0   # sub-node write offset in the packed batch
    q_off = 0   # sub-edge write offset
    n_off = 0   # global node offset of the current graph in the GraphBatch
    for g, f in zip(graphs, flats):
        m = int(f.node_off[-1])
        q = int(f.edge_off[-1])
        if node_feat is not None:
            node_feat[s_off:s_off + m] = g.node_feat[f.nodes]
        # segment id = the center's global node index in the GraphBatch
        node_center[s_off:s_off + m] = n_off + np.repeat(
            np.arange(g.num_nodes, dtype=np.int32),
            np.diff(f.node_off))
        node_orig[s_off:s_off + m] = n_off + f.nodes
        node_mask[s_off:s_off + m] = True
        senders[q_off:q_off + q] = f.senders + s_off
        receivers[q_off:q_off + q] = f.receivers + s_off
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
                                                edge_mask, num_sub_nodes,
                                                mode=banded)
    if gt_fits is None:
        # per-batch fallback; dataset-aware callers pass the stable value
        # (see pack_graphs — gt_fits is a jit-cache-key static flag)
        from .banded import gt_band_fits
        gt_fits = gt_band_fits(
            max((int(np.diff(f.node_off).max(initial=0)) for f in flats),
                default=0), num_sub_nodes)
    gt_ok = gt_fits
    return SubgraphBatch(
        node_feat=node_feat, node_center=node_center, node_orig=node_orig,
        node_mask=node_mask, senders=senders,
        receivers=receivers, edge_mask=edge_mask,
        band_blocks=band_blocks, band_col_off=band_col_off,
        gt_fits=gt_ok)


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
