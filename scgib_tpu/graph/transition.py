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


def _logm_batch_jax(adj, n_valid, k: int):
    """Device kernel: logM_1..k for a padded batch of graphs at once.

    ``adj`` [B, N, N] binary f32 (zero-padded), ``n_valid`` [B] true node
    counts.  Returns [B, k, N, N].  One batched matmul chain on the MXU
    replaces the reference's per-graph NumPy ``Ak = Ak @ A`` loop
    (util.py:73-91).  Padding stays exact: zero rows/cols give 0/0 -> NaN
    or log(0) -> -inf, both clamped to 0 exactly as GetProbTranMat
    (util.py:66-69) clamps them.
    """
    import jax
    import jax.numpy as jnp

    log_n = jnp.log(n_valid.astype(jnp.float32))[:, None, None]

    def step(Ak, _):
        Ak = Ak @ adj
        col = Ak.sum(axis=1, keepdims=True)          # colsum per matrix
        p = jnp.log(Ak / col) + log_n                # - log(1/n)
        p = jnp.where(jnp.isfinite(p), p, 0.0)
        p = jnp.maximum(p, 0.0)
        return Ak, p

    B, N = adj.shape[0], adj.shape[1]
    eye = jnp.broadcast_to(jnp.eye(N, dtype=adj.dtype), adj.shape)
    _, ps = jax.lax.scan(step, eye, None, length=k)
    return jnp.transpose(ps, (1, 0, 2, 3))


_logm_jit_cache = {}


def transition_logm_batched(graphs: Sequence[GraphData], k: int,
                            chunk: int = 512) -> List[List[np.ndarray]]:
    """logM lists for MANY graphs via the device-batched kernel.

    Pads each chunk of graphs to a common bucketed size (multiple of 16,
    so jit caches a handful of shapes), runs one [chunk, N, N] matmul
    chain per power, crops the valid blocks back out.  Bit-compatible
    with ``transition_logm`` within f32 (path counts are exact integers
    in f32 for molecular sizes); parity tested in test_data_pipeline.
    """
    import jax

    out: List[List[np.ndarray]] = [None] * len(graphs)
    order = np.argsort([g.num_nodes for g in graphs], kind="stable")
    for start in range(0, len(order), chunk):
        idx = order[start:start + chunk]
        nmax = max(int(graphs[i].num_nodes) for i in idx)
        N = max(16, -(-nmax // 16) * 16)
        B = len(idx)
        adj = np.zeros((B, N, N), dtype=np.float32)
        nv = np.zeros((B,), dtype=np.float32)
        for b, i in enumerate(idx):
            g = graphs[i]
            adj[b, g.senders, g.receivers] = 1.0
            nv[b] = g.num_nodes
        key = (N, k)
        fn = _logm_jit_cache.get(key)
        if fn is None:
            fn = jax.jit(lambda a, n: _logm_batch_jax(a, n, k))
            _logm_jit_cache[key] = fn
        res = np.asarray(fn(adj, nv))                # [B, k, N, N]
        for b, i in enumerate(idx):
            n = int(graphs[i].num_nodes)
            out[i] = [res[b, j, :n, :n].copy() for j in range(k)]
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
