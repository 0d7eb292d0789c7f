"""k-hop ego-net extraction — the replacement for ``dgl.khop_in_subgraph``.

The reference extracts, for **every node** of every graph, the subgraph
induced on the nodes at most k in-hops away (``exp_moleculenetBACE_BBBP.py:319``,
``exp_pcqm4mv2.py:422-426``; graphs are bidirected so in-hops == hops), and
caches the list-of-lists to ``pts/*_subgraphs_khop_<k>.pt``.

Here the extraction is a vectorized NumPy CSR BFS over all centers at once:
frontier expansion is one ``reachable[adj_rows]`` scatter per hop, giving an
[n, n] reachability matrix, from which node lists and induced edge lists are
sliced.  For molecular graphs (n <= a few hundred) this is orders of
magnitude faster than per-node BFS in Python, and the output feeds
``batching.pack_subgraphs``.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .batching import EgoNets, GraphData


def khop_reachability(senders: np.ndarray,
                      receivers: np.ndarray,
                      num_nodes: int,
                      k: int) -> np.ndarray:
    """Boolean [n, n] matrix R with R[v, u] = True iff dist(v, u) <= k.

    Row v is the ego-net membership of center v (follows in-edges like
    ``dgl.khop_in_subgraph``; the reference symmetrizes all graphs first so
    direction is moot).
    """
    reach = np.eye(num_nodes, dtype=bool)
    if len(senders) == 0:
        return reach
    frontier = reach.copy()
    for _ in range(k):
        # in-hop (dgl.khop_in_subgraph semantics): node s joins ego(v) if
        # some edge s->u exists with u already in the frontier of v
        nxt = np.zeros_like(reach)
        np.logical_or.at(nxt.T, senders, frontier.T[receivers])
        nxt &= ~reach
        reach |= nxt
        if not nxt.any():
            break
        frontier = nxt
    return reach


def extract_egonets(graph: GraphData, k: int) -> EgoNets:
    """Per-node induced k-hop ego-nets of one graph.

    Node lists put the center first then remaining members in ascending id
    order; edge lists are local COO over the node list (all edges of the
    original graph whose endpoints both lie in the ego-net — induced, same
    as ``dgl.khop_in_subgraph``).
    """
    n = graph.num_nodes
    reach = khop_reachability(graph.senders, graph.receivers, n, k)

    node_lists: List[np.ndarray] = []
    edge_lists: List[Tuple[np.ndarray, np.ndarray]] = []
    s, r = graph.senders, graph.receivers
    for v in range(n):
        members = np.flatnonzero(reach[v])
        members = np.concatenate(
            [[v], members[members != v]]).astype(np.int64)
        local = np.full(n, -1, dtype=np.int64)
        local[members] = np.arange(len(members))
        if len(s):
            keep = reach[v, s] & reach[v, r]
            es = local[s[keep]].astype(np.int32)
            er = local[r[keep]].astype(np.int32)
        else:
            es = np.zeros(0, dtype=np.int32)
            er = np.zeros(0, dtype=np.int32)
        node_lists.append(members.astype(np.int32))
        edge_lists.append((es, er))
    return EgoNets(node_lists=node_lists, edge_lists=edge_lists)


def egonet_sizes(graph: GraphData, k: int) -> Tuple[int, int]:
    """(total sub-nodes, total sub-edges) for one graph's flattened ego-nets
    — used by the packer to size capacity buckets."""
    reach = khop_reachability(graph.senders, graph.receivers,
                              graph.num_nodes, k)
    sub_nodes = int(reach.sum())
    if len(graph.senders):
        keep = reach[:, graph.senders] & reach[:, graph.receivers]
        sub_edges = int(keep.sum())
    else:
        sub_edges = 0
    return sub_nodes, sub_edges
