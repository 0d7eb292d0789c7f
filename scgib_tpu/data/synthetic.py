"""Synthetic molecular-graph generator.

The environment has no network egress, so the real dataset downloads the
reference performs (OGB/PyG MoleculeNet, exp_moleculenetBACE_BBBP.py:219-224)
cannot run here.  This module generates random molecule-like graphs with the
same statistical profile as PCQM4Mv2/MoleculeNet molecules (~10-30 heavy
atoms, tree-plus-rings connectivity, 9-dim integer atom features) for tests,
benchmarks, and smoke training.  Real datasets plug in through
``scgib_tpu.data.datasets`` when their files are present on disk.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..graph.batching import GraphData, symmetrize_edges


def random_molecule(rng: np.random.Generator,
                    min_nodes: int = 8,
                    max_nodes: int = 32,
                    feat_dim: int = 9,
                    extra_edge_frac: float = 0.15,
                    num_tasks: Optional[int] = None,
                    label_nan_frac: float = 0.0) -> GraphData:
    """One random connected molecule-like graph: a random spanning tree plus
    a few ring-closing edges, bidirected and deduped."""
    n = int(rng.integers(min_nodes, max_nodes + 1))
    # random tree: connect node i to a random earlier node
    parents = np.array([rng.integers(0, i) for i in range(1, n)],
                       dtype=np.int64)
    s = np.arange(1, n, dtype=np.int64)
    r = parents
    n_extra = int(extra_edge_frac * n)
    if n_extra and n > 2:
        es = rng.integers(0, n, size=n_extra)
        er = rng.integers(0, n, size=n_extra)
        keep = es != er
        s = np.concatenate([s, es[keep]])
        r = np.concatenate([r, er[keep]])
    senders, receivers = symmetrize_edges(s, r)

    feat = rng.integers(0, 10, size=(n, feat_dim)).astype(np.float32)

    label = None
    if num_tasks is not None:
        label = (rng.random(num_tasks) < 0.5).astype(np.float32)
        if label_nan_frac > 0:
            nanm = rng.random(num_tasks) < label_nan_frac
            label = np.where(nanm, np.nan, label)
    return GraphData(senders=senders, receivers=receivers, node_feat=feat,
                     label=label)


def random_dataset(num_graphs: int,
                   seed: int = 0,
                   **kw) -> List[GraphData]:
    rng = np.random.default_rng(seed)
    return [random_molecule(rng, **kw) for _ in range(num_graphs)]


def learnable_dataset(num_graphs: int,
                      seed: int = 0,
                      min_nodes: int = 8,
                      max_nodes: int = 24,
                      feat_dim: int = 9) -> List[GraphData]:
    """Synthetic CLASSIFICATION task with real signal, for end-to-end
    learning validation: half the graphs get a planted 4-clique whose
    member nodes carry an elevated feature channel; label = clique
    present.  A working pipeline separates the classes far above chance
    (tests/test_end_to_end.py)."""
    rng = np.random.default_rng(seed)
    out: List[GraphData] = []
    for i in range(num_graphs):
        g = random_molecule(rng, min_nodes=min_nodes, max_nodes=max_nodes,
                            feat_dim=feat_dim)
        label = float(i % 2 == 0)
        feat = g.node_feat.copy()
        s, r = g.senders, g.receivers
        if label > 0.5:
            n = g.num_nodes
            members = rng.choice(n, size=min(4, n), replace=False)
            es, er = [], []
            for a in members:
                for b in members:
                    if a != b:
                        es.append(a)
                        er.append(b)
            s, r = symmetrize_edges(
                np.concatenate([s, np.asarray(es)]),
                np.concatenate([r, np.asarray(er)]))
            feat[members, 0] += 4.0
        out.append(GraphData(senders=s, receivers=r, node_feat=feat,
                             label=np.asarray([label], np.float32)))
    return out
