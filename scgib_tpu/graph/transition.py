"""k-step transition matrices (NetMF-style log transition) — replacement for
the reference's ``util.getM_logM`` / ``GetProbTranMat`` (util.py:60-91).

The reference builds, per graph, A^i for i=1..k (dense matmuls) and the
log-probability transition matrix
``log(A^i / colsum(A^i)) - log(1/n)`` with negatives/NaN clamped to 0.
These feed the optional ``recons_type='logM'`` loss (models.py:770-782).

Host NumPy here (preprocessing); the batched padded form for the device-side
loss is produced by ``pack_logm_targets``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from .batching import GraphData


def transition_logm(graph: GraphData, k: int) -> List[np.ndarray]:
    """[logM_1 ... logM_k], each [n, n] float32.  Matches util.py:60-91:
    A is the *binary* adjacency (``dgl_g.adj().to_dense()``), powers are
    cumulative products, colsum-normalized, log'ed, clamped at 0."""
    n = graph.num_nodes
    A = np.zeros((n, n), dtype=np.float64)
    A[graph.senders, graph.receivers] = 1.0
    out: List[np.ndarray] = []
    Ak = np.eye(n, dtype=np.float64)
    for _ in range(k):
        Ak = Ak @ A
        col = Ak.sum(axis=0, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            p = np.log(Ak / col) - np.log(1.0 / n)
        p[~np.isfinite(p)] = 0.0
        p[p < 0] = 0.0
        out.append(p.astype(np.float32))
    return out


def pack_logm_targets(graphs: Sequence[GraphData],
                      logms: Sequence[List[np.ndarray]],
                      num_nodes: int,
                      k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Assemble block-diagonal padded targets for the logM reconstruction
    loss: T [k, N, N] with graph g's logM_i in its node block, and a weight
    matrix W [N, N] with 1/(n_g^2) inside each block (the reference's
    per-graph ``/(row_num*col_num)`` at models.py:779-780)."""
    T = np.zeros((k, num_nodes, num_nodes), dtype=np.float32)
    W = np.zeros((num_nodes, num_nodes), dtype=np.float32)
    off = 0
    for g, lm in zip(graphs, logms):
        n = g.num_nodes
        for i in range(k):
            T[i, off:off + n, off:off + n] = lm[i]
        W[off:off + n, off:off + n] = 1.0 / float(n * n)
        off += n
    return T, W
