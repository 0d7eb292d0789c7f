"""Compact wire format for host->device batch transfer.

Over a remote/tunneled accelerator the per-batch upload dominates the
sustained training loop (bench.py).  The padded ``GraphBatch``/
``SubgraphBatch`` wire cost is mostly int32 index arrays, boolean masks,
and float32 categorical features — all compressible without any loss:

  * index arrays -> int16 when the capacity fits (all caps < 32768 for
    molecular batches), cast back to int32 on device;
  * boolean masks -> three scalar COUNTS: the packers fill real entries
    as a contiguous prefix (pack_graphs/pack_subgraphs/pack_flat_batch
    all write real rows first, padding at the tail), so
    ``mask = arange(cap) < count`` reconstructs them exactly on device;
  * float32 features -> int8 when every value is integral in [-128, 127]
    (OGB/PyG atom features are small categorical codes,
    ogb atom_to_feature_vector; util.py:277-325) — cast back on device.

``from_wire*`` runs under jit: the reconstitution is a handful of iotas
and casts, fused by XLA into the first consumers.  Measured ~2.6x less
wire per batch (0.71 -> 0.27 MB for the PCQM4Mv2-like bench shape).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from .container import GraphBatch, SubgraphBatch


@struct.dataclass
class WireGraph:
    node_feat: jnp.ndarray        # [N, F] int8 | float32
    node_graph: jnp.ndarray       # [N] int16 | int32
    senders: jnp.ndarray          # [E]
    receivers: jnp.ndarray        # [E]
    n_nodes: jnp.ndarray          # [] int32 real-node count
    n_edges: jnp.ndarray          # [] int32
    n_graphs: jnp.ndarray         # [] int32
    num_graphs_cap: int = struct.field(pytree_node=False, default=0)
    labels: Optional[jnp.ndarray] = None
    label_mask: Optional[jnp.ndarray] = None
    band_col_off: Optional[jnp.ndarray] = None


@struct.dataclass
class WireSub:
    node_center: jnp.ndarray      # [S]
    node_orig: jnp.ndarray        # [S]
    n_nodes: jnp.ndarray          # [] int32
    senders: jnp.ndarray          # [Q]
    receivers: jnp.ndarray        # [Q]
    n_edges: jnp.ndarray          # [] int32
    band_col_off: Optional[jnp.ndarray] = None


def _idx_dtype(cap: int):
    return np.int16 if cap < 2 ** 15 else np.int32


def _shrink_idx(a: np.ndarray, cap: int) -> np.ndarray:
    return np.asarray(a).astype(_idx_dtype(cap))


def _shrink_feat(feat: np.ndarray) -> np.ndarray:
    f = np.asarray(feat)
    if (f.dtype == np.float32 and np.all(f == np.round(f))
            and np.all(np.abs(f) <= 127)):
        return f.astype(np.int8)
    return f


def _count(mask) -> np.int32:
    # packers guarantee a contiguous valid prefix
    return np.int32(np.asarray(mask).sum())


def to_wire_graph(g: GraphBatch) -> WireGraph:
    """Host-side (NumPy) compression of a packed GraphBatch."""
    n_cap = g.node_feat.shape[0]
    return WireGraph(
        node_feat=_shrink_feat(g.node_feat),
        node_graph=_shrink_idx(g.node_graph, g.graph_mask.shape[0]),
        senders=_shrink_idx(g.senders, n_cap),
        receivers=_shrink_idx(g.receivers, n_cap),
        n_nodes=_count(g.node_mask),
        n_edges=_count(g.edge_mask),
        n_graphs=_count(g.graph_mask),
        num_graphs_cap=int(g.graph_mask.shape[0]),
        labels=None if g.labels is None else np.asarray(g.labels),
        label_mask=(None if g.label_mask is None
                    else np.asarray(g.label_mask)),
        band_col_off=(None if g.band_col_off is None
                      else np.asarray(g.band_col_off)),
    )


def to_wire_sub(sub: SubgraphBatch) -> WireSub:
    if sub.node_feat is not None:
        raise ValueError("wire format expects the node_feat=None "
                         "(derive-on-device) SubgraphBatch layout")
    s_cap = sub.node_center.shape[0]
    # node_center/node_orig index the OWNING batch's node space; their
    # capacity bound is the owning node cap, which callers don't have
    # here — use the observed max (safe: dtype chosen from actual values)
    c_max = int(np.asarray(sub.node_center).max(initial=0))
    o_max = int(np.asarray(sub.node_orig).max(initial=0))
    return WireSub(
        node_center=_shrink_idx(sub.node_center, c_max + 1),
        node_orig=_shrink_idx(sub.node_orig, o_max + 1),
        n_nodes=_count(sub.node_mask),
        senders=_shrink_idx(sub.senders, s_cap),
        receivers=_shrink_idx(sub.receivers, s_cap),
        n_edges=_count(sub.edge_mask),
        band_col_off=(None if sub.band_col_off is None
                      else np.asarray(sub.band_col_off)),
    )


def from_wire_graph(w: WireGraph) -> GraphBatch:
    """Device-side reconstitution (runs under jit)."""
    n_cap = w.node_graph.shape[0]
    e_cap = w.senders.shape[0]
    return GraphBatch(
        node_feat=w.node_feat.astype(jnp.float32),
        node_graph=w.node_graph.astype(jnp.int32),
        node_mask=jnp.arange(n_cap, dtype=jnp.int32) < w.n_nodes,
        senders=w.senders.astype(jnp.int32),
        receivers=w.receivers.astype(jnp.int32),
        edge_mask=jnp.arange(e_cap, dtype=jnp.int32) < w.n_edges,
        graph_mask=(jnp.arange(w.num_graphs_cap, dtype=jnp.int32)
                    < w.n_graphs),
        labels=w.labels,
        label_mask=w.label_mask,
        band_col_off=w.band_col_off,
    )


# --- single-buffer transport ------------------------------------------------
#
# Even with the compact dtypes, one superbatch is ~20 separate leaf
# arrays, and over a tunneled link the per-transfer round-trip latency
# (not bandwidth) dominates: 20 puts x ~8 ms >> 4 MB / link rate.  So the
# host serializes the WHOLE (stacked) wire pytree into one contiguous
# uint8 buffer — ONE device_put — and the device reconstitutes the leaves
# under jit with static slices + bitcasts (free after XLA fusion).


import dataclasses

import jax
import jax.tree_util as jtu
from jax import lax


@dataclasses.dataclass(frozen=True)
class ByteSpec:
    """Static layout of a pytree serialized into one byte buffer."""

    treedef: object
    leaves: tuple            # of (dtype_str, shape, offset, nbytes)
    total: int


def byte_spec_of(tree) -> ByteSpec:
    """Compute the buffer layout for a host (NumPy-leaf) pytree; offsets
    are 4-byte aligned so every leaf bitcasts cleanly."""
    leaves, treedef = jtu.tree_flatten(tree)
    spec = []
    off = 0
    for a in leaves:
        a = np.asarray(a)
        nb = a.nbytes
        spec.append((str(a.dtype), a.shape, off, nb))
        off += (nb + 3) // 4 * 4
    return ByteSpec(treedef=treedef, leaves=tuple(spec), total=off)


def pack_bytes(tree, spec: ByteSpec) -> np.ndarray:
    """Serialize the pytree into one uint8 buffer matching ``spec``."""
    leaves = jtu.tree_leaves(tree)
    buf = np.zeros(spec.total, np.uint8)
    for a, (dt, shape, off, nb) in zip(leaves, spec.leaves):
        a = np.asarray(a)
        assert str(a.dtype) == dt and a.shape == tuple(shape), \
            f"leaf mismatch: {a.dtype}{a.shape} vs spec {dt}{shape}"
        # note: ascontiguousarray AFTER the check — it promotes 0-d to 1-d
        a = np.ascontiguousarray(a)
        buf[off:off + nb] = a.view(np.uint8).reshape(-1)
    return buf


def unpack_bytes(buf: jnp.ndarray, spec: ByteSpec):
    """Device-side (jit) reconstruction of the pytree from the buffer."""
    out = []
    for dt, shape, off, nb in spec.leaves:
        seg = lax.slice(buf, (off,), (off + nb,))
        dtype = np.dtype(dt)
        if dtype == np.bool_:
            leaf = lax.bitcast_convert_type(seg, jnp.int8) != 0
        elif dtype.itemsize == 1:
            leaf = lax.bitcast_convert_type(seg, dtype)
        else:
            leaf = lax.bitcast_convert_type(
                seg.reshape(-1, dtype.itemsize), dtype)
        out.append(leaf.reshape(shape))
    return jtu.tree_unflatten(spec.treedef, out)


def from_wire_sub(w: WireSub) -> SubgraphBatch:
    s_cap = w.node_center.shape[0]
    q_cap = w.senders.shape[0]
    return SubgraphBatch(
        node_feat=None,
        node_center=w.node_center.astype(jnp.int32),
        node_orig=w.node_orig.astype(jnp.int32),
        node_mask=jnp.arange(s_cap, dtype=jnp.int32) < w.n_nodes,
        senders=w.senders.astype(jnp.int32),
        receivers=w.receivers.astype(jnp.int32),
        edge_mask=jnp.arange(q_cap, dtype=jnp.int32) < w.n_edges,
        band_col_off=w.band_col_off,
    )
