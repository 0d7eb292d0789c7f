"""Host-side data pipeline: dataset container, capacity sizing, batch
iteration, and device prefetch.

Replaces the reference's ``torch.utils.data.DataLoader`` + custom collate
(``MoleculeDataset.collate``, molecules.py:349-362; loops at
exp_pretraining.py:94-99) with a packed-batch pipeline:

  * ``GraphDataset``   — graphs + precomputed k-hop ego-nets + labels.
  * ``plan_capacities``— pick padded buffer sizes (node/edge/sub caps) for a
                         batch size from dataset statistics, rounded to
                         bucket multiples so jit compiles once per bucket.
  * ``batch_iterator`` — shuffled fixed-size batches packed to GraphBatch +
                         SubgraphBatch (NumPy, host).
  * ``prefetch_to_device`` — double-buffered background-thread device puts
                         (the reference's ``.to(device)`` copies,
                         exp_pretraining.py:303, made asynchronous).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..graph.batching import (BucketSpec, EgoNets, GraphData, pack_graphs,
                              pack_subgraphs)
from ..graph.container import GraphBatch, SubgraphBatch
from ..graph.egonet import extract_egonets


@dataclasses.dataclass
class GraphDataset:
    """A list of host graphs with their ego-nets (computed on demand)."""

    graphs: List[GraphData]
    k: int = 1
    egonets: Optional[List[EgoNets]] = None

    def __post_init__(self):
        if self.egonets is None:
            from ..native import extract_egonets_batch

            # threaded C++ extraction when the native lib is available,
            # NumPy BFS otherwise (identical output, tests/test_native.py)
            self.egonets = extract_egonets_batch(self.graphs, self.k)

    def __len__(self) -> int:
        return len(self.graphs)

    def subset(self, indices: Sequence[int]) -> "GraphDataset":
        return GraphDataset(
            graphs=[self.graphs[i] for i in indices], k=self.k,
            egonets=[self.egonets[i] for i in indices])

    def split(self, n_train: int, n_val: int,
              shuffle_seed: Optional[int] = None):
        """(train, val, test) via the reference's hardcoded prefix splits
        (molecules.py:211-343), after an optional shuffle (the reference
        random.shuffle's samples_all first, exp_*BACE_BBBP.py:276)."""
        idx = np.arange(len(self))
        if shuffle_seed is not None:
            np.random.default_rng(shuffle_seed).shuffle(idx)
        return (self.subset(idx[:n_train]),
                self.subset(idx[n_train:n_train + n_val]),
                self.subset(idx[n_train + n_val:]))


@dataclasses.dataclass(frozen=True)
class Capacities:
    nodes: int
    edges: int
    graphs: int
    sub_nodes: int
    sub_edges: int


def plan_capacities(ds: GraphDataset, batch_size: int,
                    bucket: BucketSpec = BucketSpec(),
                    safety: float = 1.1) -> Capacities:
    """Size padded buffers so any ``batch_size`` contiguous sample fits:
    batch_size * (mean + 3 std) per quantity, floored at batch_size * max
    single graph, with a safety factor, rounded up to bucket multiples."""
    n = np.array([g.num_nodes for g in ds.graphs], dtype=np.float64)
    e = np.array([max(g.num_edges, 1) for g in ds.graphs], dtype=np.float64)
    sn = np.array([sum(len(nl) for nl in ego.node_lists)
                   for ego in ds.egonets], dtype=np.float64)
    se = np.array([max(sum(len(el[0]) for el in ego.edge_lists), 1)
                   for ego in ds.egonets], dtype=np.float64)

    def cap(arr):
        est = batch_size * (arr.mean() + 3.0 * arr.std())
        return int(max(est, arr.max()) * safety)

    return Capacities(
        nodes=bucket.nodes(cap(n)),
        edges=bucket.edges(cap(e)),
        graphs=bucket.graphs(batch_size),
        sub_nodes=bucket.nodes(cap(sn)),
        sub_edges=bucket.edges(cap(se)),
    )


def batch_iterator(ds: GraphDataset, batch_size: int, caps: Capacities,
                   shuffle: bool = True, seed: int = 0,
                   drop_last: bool = False
                   ) -> Iterator[Tuple[GraphBatch, SubgraphBatch]]:
    """Yield packed (GraphBatch, SubgraphBatch) batches.  A batch whose
    graphs overflow the planned capacities is split greedily (rare tail
    case; logged by the caller via the smaller batch)."""
    order = np.arange(len(ds))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)

    i = 0
    while i < len(order):
        take = min(batch_size, len(order) - i)
        if drop_last and take < batch_size:
            break
        # greedy shrink if capacity would overflow
        while take > 1:
            sel = order[i:i + take]
            tot_n = sum(ds.graphs[j].num_nodes for j in sel)
            tot_e = sum(ds.graphs[j].num_edges for j in sel)
            tot_sn = sum(sum(len(nl) for nl in ds.egonets[j].node_lists)
                         for j in sel)
            tot_se = sum(sum(len(el[0]) for el in ds.egonets[j].edge_lists)
                         for j in sel)
            if (tot_n <= caps.nodes and tot_e <= caps.edges
                    and tot_sn <= caps.sub_nodes
                    and tot_se <= caps.sub_edges):
                break
            take -= 1
        sel = order[i:i + take]
        graphs = [ds.graphs[j] for j in sel]
        egos = [ds.egonets[j] for j in sel]
        g = pack_graphs(graphs, caps.nodes, caps.edges, caps.graphs)
        sub = pack_subgraphs(graphs, egos, caps.sub_nodes, caps.sub_edges)
        yield g, sub
        i += take


def prefetch_to_device(it: Iterator, size: int = 2,
                       device=None) -> Iterator:
    """Run the host packer in a background thread and device_put batches
    ahead of consumption (double buffering)."""
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    def worker():
        try:
            for item in it:
                q.put(jax.device_put(item, device))
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item
