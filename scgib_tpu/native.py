"""ctypes binding for the native host library (native/scgib_native.cc).

Provides ``extract_egonets_batch`` — the threaded C++ replacement for the
per-graph NumPy BFS in ``graph.egonet`` (itself replacing the reference's
per-node ``dgl.khop_in_subgraph`` Python loop, exp_pcqm4mv2.py:422-426).

The library is built on demand with g++ (cached next to the source); if
no compiler is available the NumPy implementation is used transparently —
``HAVE_NATIVE`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

from .graph.batching import EgoNets, GraphData

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "scgib_native.cc")
_SO = os.path.join(_NATIVE_DIR, "libscgib_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not (os.path.exists(_SRC) and _build()):
                if not os.path.exists(_SO):
                    return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None

        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.scgib_egonet_sizes.argtypes = [
            ctypes.c_int32, i64p, i64p, i32p, i32p, ctypes.c_int32,
            i32p, i32p, ctypes.c_int32]
        lib.scgib_egonet_fill.argtypes = [
            ctypes.c_int32, i64p, i64p, i32p, i32p, ctypes.c_int32,
            i64p, i64p, i32p, i32p, i32p, ctypes.c_int32]
        lib.scgib_gather_rows.argtypes = [
            f32p, ctypes.c_int32, i32p, ctypes.c_int64, f32p]
        if hasattr(lib, "scgib_pack_batch"):
            i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
            lib.scgib_pack_batch.argtypes = [
                ctypes.c_int32, i64p, i64p, i64p, i64p, i64p,
                f32p, ctypes.c_int32, i32p, i32p, i32p, i32p, i32p, i32p,
                f32p, i32p, i8p, i32p, i32p, i8p,
                i32p, i32p, i8p, i32p, i32p, i8p,
                i64p, ctypes.c_int32]
        lib.scgib_version.restype = ctypes.c_int32
        _lib = lib
        return _lib


def have_native() -> bool:
    return _load() is not None


def extract_egonets_batch(graphs: Sequence[GraphData], k: int,
                          n_threads: Optional[int] = None
                          ) -> List[EgoNets]:
    """Threaded C++ k-hop ego-net extraction for a list of graphs.

    Identical output to ``[egonet.extract_egonets(g, k) for g in graphs]``
    (center-first ascending node lists, induced edges in original edge
    order).  Falls back to the NumPy path when the library is unavailable.
    """
    lib = _load()
    if lib is None:
        from .graph.egonet import extract_egonets

        return [extract_egonets(g, k) for g in graphs]

    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)

    n_graphs = len(graphs)
    node_off = np.zeros(n_graphs + 1, np.int64)
    edge_off = np.zeros(n_graphs + 1, np.int64)
    for i, g in enumerate(graphs):
        node_off[i + 1] = node_off[i] + g.num_nodes
        edge_off[i + 1] = edge_off[i] + g.num_edges
    senders = np.ascontiguousarray(
        np.concatenate([g.senders for g in graphs]) if n_graphs else
        np.zeros(0), dtype=np.int32)
    receivers = np.ascontiguousarray(
        np.concatenate([g.receivers for g in graphs]) if n_graphs else
        np.zeros(0), dtype=np.int32)

    total_nodes = int(node_off[-1])
    node_counts = np.zeros(total_nodes, np.int32)
    edge_counts = np.zeros(total_nodes, np.int32)
    lib.scgib_egonet_sizes(n_graphs, node_off, edge_off, senders,
                           receivers, k, node_counts, edge_counts,
                           n_threads)

    node_out_off = np.zeros(total_nodes, np.int64)
    edge_out_off = np.zeros(total_nodes, np.int64)
    np.cumsum(node_counts[:-1], out=node_out_off[1:]) if total_nodes else 0
    np.cumsum(edge_counts[:-1], out=edge_out_off[1:]) if total_nodes else 0
    total_sub_nodes = int(node_counts.sum())
    total_sub_edges = int(edge_counts.sum())

    out_nodes = np.zeros(total_sub_nodes, np.int32)
    out_src = np.zeros(total_sub_edges, np.int32)
    out_dst = np.zeros(total_sub_edges, np.int32)
    lib.scgib_egonet_fill(n_graphs, node_off, edge_off, senders, receivers,
                          k, node_out_off, edge_out_off, out_nodes,
                          out_src, out_dst, n_threads)

    result: List[EgoNets] = []
    c = 0
    for i, g in enumerate(graphs):
        node_lists, edge_lists = [], []
        for _v in range(g.num_nodes):
            s0 = node_out_off[c]
            s1 = s0 + node_counts[c]
            q0 = edge_out_off[c]
            q1 = q0 + edge_counts[c]
            node_lists.append(out_nodes[s0:s1])
            edge_lists.append((out_src[q0:q1], out_dst[q0:q1]))
            c += 1
        result.append(EgoNets(node_lists=node_lists,
                              edge_lists=edge_lists))
    return result


def pack_batch_native(fd, sel: np.ndarray, caps):
    """Threaded C++ batch packer over a FlatDataset (scgib_pack_batch).

    Returns the same tuple as ``data.flat._pack_numpy`` or None when the
    library is unavailable (caller falls back to NumPy)."""
    lib = _load()
    if lib is None or not hasattr(lib, "scgib_pack_batch"):
        return None

    sel = np.ascontiguousarray(sel, np.int64)
    B = len(sel)
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
    used = np.zeros(4, np.int64)

    lib.scgib_pack_batch(
        B, sel, fd.node_off, fd.edge_off, fd.ego_node_off, fd.ego_edge_off,
        fd.feat, np.int32(F), fd.senders, fd.receivers, fd.ego_nodes,
        fd.ego_center, fd.ego_senders, fd.ego_receivers,
        node_feat, node_graph, node_mask.view(np.int8),
        senders, receivers, edge_mask.view(np.int8),
        node_center, node_orig, sub_node_mask.view(np.int8),
        sub_s, sub_r, sub_edge_mask.view(np.int8),
        used, np.int32(min(os.cpu_count() or 1, 8)))
    return (node_feat, node_graph, node_mask, senders, receivers,
            edge_mask, node_center, node_orig, sub_node_mask, sub_s,
            sub_r, sub_edge_mask, int(used[0]), int(used[1]),
            int(used[2]), int(used[3]))


def gather_rows(feat: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """out[i] = feat[idx[i]] via native memcpy rows (fallback: fancy
    indexing)."""
    lib = _load()
    feat = np.ascontiguousarray(feat, dtype=np.float32)
    idx = np.ascontiguousarray(idx, dtype=np.int32)
    if lib is None:
        return feat[idx]
    out = np.empty((idx.shape[0], feat.shape[1]), np.float32)
    lib.scgib_gather_rows(feat, feat.shape[1], idx, idx.shape[0], out)
    return out
