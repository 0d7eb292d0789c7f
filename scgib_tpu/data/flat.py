"""Flat dataset representation + fast batch packing.

``GraphDataset`` keeps one Python object per graph — flexible, but batch
packing then runs ~10 NumPy calls per graph (measured 15 ms per 128-graph
batch, 7x the device step).  ``FlatDataset`` stores the whole dataset as
a few contiguous arrays (the same shape as the ``data/cache.py`` .npz
format) so packing one batch is a handful of slice copies per graph —
done either by the threaded C++ library (``native/scgib_native.cc``,
``scgib_pack_batch``) or a vectorized NumPy fallback with identical
output.

Key invariant: per-graph edge lists are pre-sorted receiver-major at
build time.  Packed graphs occupy disjoint ascending node ranges, so the
concatenation of per-graph sorted lists is globally sorted — the packer
never sorts at batch time (the Python packer's ``np.lexsort``).

Banded layout: the batch qualifies for the banded MXU path when every
selected graph has at most ``band - tile - align`` + ... conservatively
``band//2 - tile//2`` = 64 nodes (see the window-arithmetic proof in
``qualifies_banded``); larger graphs fall back to the exact per-batch
check of the Python packer.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..graph.banded import banded_col_off
from ..graph.batching import GraphData
from ..graph.container import GraphBatch, SubgraphBatch
from .loader import Capacities, GraphDataset


@dataclasses.dataclass
class FlatDataset:
    """Whole dataset as contiguous arrays; graph g owns
    nodes [node_off[g], node_off[g+1]), edges [edge_off[g], ...), ego
    sub-nodes [ego_node_off[g], ...), ego edges [ego_edge_off[g], ...).

    All ids are graph-local; ego senders/receivers are graph-flat (local
    to the graph's concatenated ego-nets); edge lists receiver-major."""

    node_off: np.ndarray       # [G+1] int64
    edge_off: np.ndarray       # [G+1] int64
    feat: np.ndarray           # [N_tot, F] float32
    senders: np.ndarray        # [E_tot] int32 (graph-local, sorted)
    receivers: np.ndarray      # [E_tot] int32
    ego_node_off: np.ndarray   # [G+1] int64
    ego_edge_off: np.ndarray   # [G+1] int64
    ego_nodes: np.ndarray      # [S_tot] int32 (graph-local orig node)
    ego_center: np.ndarray     # [S_tot] int32 (graph-local center node)
    ego_senders: np.ndarray    # [Q_tot] int32 (graph-flat, sorted)
    ego_receivers: np.ndarray  # [Q_tot] int32
    max_ego: np.ndarray = None       # [G] int32 — largest ego-net per graph
    labels: Optional[np.ndarray] = None      # [G, T] float32 (NaN = missing)

    @property
    def num_graphs(self) -> int:
        return len(self.node_off) - 1

    def graph_sizes(self):
        return (np.diff(self.node_off), np.diff(self.edge_off),
                np.diff(self.ego_node_off), np.diff(self.ego_edge_off))


def build_flat(ds: GraphDataset) -> FlatDataset:
    """One-time conversion; per-graph edge lists are receiver-major
    sorted here so batch packing never sorts."""
    G = len(ds)
    node_off = np.zeros(G + 1, np.int64)
    edge_off = np.zeros(G + 1, np.int64)
    ego_node_off = np.zeros(G + 1, np.int64)
    ego_edge_off = np.zeros(G + 1, np.int64)

    feats, ss, rs = [], [], []
    enodes, ecenters, ess, ers = [], [], [], []
    max_ego = np.zeros(G, np.int32)
    labels: List[Optional[np.ndarray]] = []
    for i, (g, ego) in enumerate(zip(ds.graphs, ds.egonets)):
        node_off[i + 1] = node_off[i] + g.num_nodes
        edge_off[i + 1] = edge_off[i] + g.num_edges
        feats.append(np.asarray(g.node_feat, np.float32))
        order = np.lexsort((g.senders, g.receivers))
        ss.append(np.asarray(g.senders, np.int32)[order])
        rs.append(np.asarray(g.receivers, np.int32)[order])
        labels.append(None if g.label is None
                      else np.atleast_1d(np.asarray(g.label, np.float32)))

        f = ego.flat()
        sizes = np.diff(f.node_off)
        max_ego[i] = int(sizes.max(initial=0))
        ego_node_off[i + 1] = ego_node_off[i] + len(f.nodes)
        ego_edge_off[i + 1] = ego_edge_off[i] + len(f.senders)
        enodes.append(f.nodes)
        ecenters.append(np.repeat(
            np.arange(g.num_nodes, dtype=np.int32),
            np.diff(f.node_off)).astype(np.int32))
        order = np.lexsort((f.senders, f.receivers))
        ess.append(f.senders[order])
        ers.append(f.receivers[order])

    lab_arr = None
    if any(l is not None for l in labels):
        t = max(l.shape[0] for l in labels if l is not None)
        lab_arr = np.full((G, t), np.nan, np.float32)
        for i, l in enumerate(labels):
            if l is not None:
                lab_arr[i, :l.shape[0]] = l

    cat = lambda xs, dt: (np.ascontiguousarray(np.concatenate(xs), dtype=dt)
                          if xs else np.zeros(0, dt))
    return FlatDataset(
        node_off=node_off, edge_off=edge_off,
        feat=np.ascontiguousarray(np.concatenate(feats), dtype=np.float32),
        senders=cat(ss, np.int32), receivers=cat(rs, np.int32),
        ego_node_off=ego_node_off, ego_edge_off=ego_edge_off,
        ego_nodes=cat(enodes, np.int32), ego_center=cat(ecenters, np.int32),
        ego_senders=cat(ess, np.int32), ego_receivers=cat(ers, np.int32),
        max_ego=max_ego, labels=lab_arr)


def _pack_numpy(fd: FlatDataset, sel: np.ndarray, caps: Capacities):
    """Vectorized fallback with output identical to scgib_pack_batch."""
    n_sz, e_sz, sn_sz, se_sz = (arr[sel] for arr in fd.graph_sizes())
    B = len(sel)
    n_base = np.zeros(B + 1, np.int64); np.cumsum(n_sz, out=n_base[1:])
    e_base = np.zeros(B + 1, np.int64); np.cumsum(e_sz, out=e_base[1:])
    s_base = np.zeros(B + 1, np.int64); np.cumsum(sn_sz, out=s_base[1:])
    q_base = np.zeros(B + 1, np.int64); np.cumsum(se_sz, out=q_base[1:])

    F = fd.feat.shape[1]
    node_feat = np.zeros((caps.nodes, F), np.float32)
    node_graph = np.zeros(caps.nodes, np.int32)
    node_mask = np.zeros(caps.nodes, bool)
    senders = np.zeros(caps.edges, np.int32)
    receivers = np.zeros(caps.edges, np.int32)
    edge_mask = np.zeros(caps.edges, bool)
    node_center = np.zeros(caps.sub_nodes, np.int32)
    node_orig = np.zeros(caps.sub_nodes, np.int32)
    sub_node_mask = np.zeros(caps.sub_nodes, bool)
    sub_s = np.zeros(caps.sub_edges, np.int32)
    sub_r = np.zeros(caps.sub_edges, np.int32)
    sub_edge_mask = np.zeros(caps.sub_edges, bool)

    for b, gi in enumerate(sel):
        n0, n1 = fd.node_off[gi], fd.node_off[gi + 1]
        e0, e1 = fd.edge_off[gi], fd.edge_off[gi + 1]
        s0, s1 = fd.ego_node_off[gi], fd.ego_node_off[gi + 1]
        q0, q1 = fd.ego_edge_off[gi], fd.ego_edge_off[gi + 1]
        nb, eb, sb, qb = n_base[b], e_base[b], s_base[b], q_base[b]
        node_feat[nb:nb + (n1 - n0)] = fd.feat[n0:n1]
        node_graph[nb:nb + (n1 - n0)] = b
        senders[eb:eb + (e1 - e0)] = fd.senders[e0:e1] + nb
        receivers[eb:eb + (e1 - e0)] = fd.receivers[e0:e1] + nb
        node_center[sb:sb + (s1 - s0)] = fd.ego_center[s0:s1] + nb
        node_orig[sb:sb + (s1 - s0)] = fd.ego_nodes[s0:s1] + nb
        sub_s[qb:qb + (q1 - q0)] = fd.ego_senders[q0:q1] + sb
        sub_r[qb:qb + (q1 - q0)] = fd.ego_receivers[q0:q1] + sb
    node_mask[:n_base[-1]] = True
    edge_mask[:e_base[-1]] = True
    sub_node_mask[:s_base[-1]] = True
    sub_edge_mask[:q_base[-1]] = True
    return (node_feat, node_graph, node_mask, senders, receivers, edge_mask,
            node_center, node_orig, sub_node_mask, sub_s, sub_r,
            sub_edge_mask, int(n_base[-1]), int(e_base[-1]),
            int(s_base[-1]), int(q_base[-1]))


def pack_flat_batch(fd: FlatDataset, sel: Sequence[int], caps: Capacities,
                    num_tasks: Optional[int] = None,
                    banded: bool = True,
                    tile: int = 128, band: int = 256
                    ) -> Tuple[GraphBatch, SubgraphBatch]:
    """Pack one batch from the flat arrays (native C++ when available).

    Output layout matches ``pack_graphs``/``pack_subgraphs(banded=
    'device')``: same arrays, same edge order (receiver-major), device-
    built banded blocks via ``band_col_off`` when the selection
    qualifies."""
    sel = np.asarray(sel, np.int64)
    n_sz, e_sz, sn_sz, se_sz = (arr[sel] for arr in fd.graph_sizes())
    if (n_sz.sum() > caps.nodes or e_sz.sum() > caps.edges
            or sn_sz.sum() > caps.sub_nodes
            or se_sz.sum() > caps.sub_edges):
        raise ValueError(
            f"batch exceeds capacities {caps}: needs nodes {n_sz.sum()}, "
            f"edges {e_sz.sum()}, sub_nodes {sn_sz.sum()}, "
            f"sub_edges {se_sz.sum()}")

    from ..native import pack_batch_native

    out = pack_batch_native(fd, sel, caps)
    if out is None:
        out = _pack_numpy(fd, sel, caps)
    (node_feat, node_graph, node_mask, senders, receivers, edge_mask,
     node_center, node_orig, sub_node_mask, sub_s, sub_r, sub_edge_mask,
     n_used, e_used, s_used, q_used) = out

    # padding edges self-loop on the last padding node (packer contract)
    if e_used < caps.edges:
        pad = caps.nodes - 1 if n_used < caps.nodes else 0
        senders[e_used:] = pad
        receivers[e_used:] = pad
    if q_used < caps.sub_edges:
        pad = caps.sub_nodes - 1 if s_used < caps.sub_nodes else 0
        sub_s[q_used:] = pad
        sub_r[q_used:] = pad

    labels = label_mask = None
    if fd.labels is not None:
        t = num_tasks or fd.labels.shape[1]
        labels = np.zeros((caps.graphs, t), np.float32)
        label_mask = np.zeros((caps.graphs, t), bool)
        lab = fd.labels[sel][:, :t]
        labels[:len(sel)] = np.nan_to_num(lab, nan=0.0)
        label_mask[:len(sel)] = ~np.isnan(lab)
    graph_mask = np.zeros(caps.graphs, bool)
    graph_mask[:len(sel)] = True

    # Placement-independent band feasibility (proof: a receiver v in
    # row-tile t with start t0 — a multiple of tile, hence of align — gets
    # window [t0 - (band-tile)/2, t0 + (band+tile)/2).  An edge stays
    # inside one graph (resp. one ego-net run in the sub space), so its
    # sender u satisfies v - n < u < v + n for unit size n, which fits the
    # window whenever n <= (band - tile)/2.  End clamping only shifts
    # windows toward valid senders.)
    lim = (band - tile) // 2
    band_ok = (banded and len(sel) > 0
               and caps.nodes % tile == 0 and caps.nodes >= band
               and caps.sub_nodes % tile == 0 and caps.sub_nodes >= band
               and bool((n_sz <= lim).all())
               and bool((fd.max_ego[sel] <= lim).all()))

    # gt_fits uses DATASET-level maxima, not the selection's: the flag is
    # static (a jit-cache key), so it must not flip between batches of
    # one dataset (graph/banded.py gt geometry note)
    from ..graph.banded import gt_band_fits
    ds_max_n = int(np.diff(fd.node_off).max(initial=0))
    ds_max_ego = int(fd.max_ego.max(initial=0))
    g = GraphBatch(
        node_feat=node_feat, node_graph=node_graph, node_mask=node_mask,
        senders=senders, receivers=receivers, edge_mask=edge_mask,
        graph_mask=graph_mask, labels=labels, label_mask=label_mask,
        band_blocks=None,
        band_col_off=banded_col_off(caps.nodes, tile, band)
        if band_ok else None,
        gt_fits=gt_band_fits(ds_max_n, caps.nodes))
    sub = SubgraphBatch(
        node_feat=None, node_center=node_center, node_orig=node_orig,
        node_mask=sub_node_mask, senders=sub_s, receivers=sub_r,
        edge_mask=sub_edge_mask, band_blocks=None,
        band_col_off=banded_col_off(caps.sub_nodes, tile, band)
        if band_ok else None,
        gt_fits=gt_band_fits(ds_max_ego, caps.sub_nodes))
    return g, sub
