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
    senders: Optional[jnp.ndarray]    # [E] (absolute mode; None if compact)
    receivers: Optional[jnp.ndarray]  # [E]
    n_nodes: jnp.ndarray          # [] int32 real-node count
    n_edges: jnp.ndarray          # [] int32
    n_graphs: jnp.ndarray         # [] int32
    num_graphs_cap: int = struct.field(pytree_node=False, default=0)
    labels: Optional[jnp.ndarray] = None
    label_mask: Optional[jnp.ndarray] = None
    band_col_off: Optional[jnp.ndarray] = None
    # compact mode (to_wire_graph(compact=True)): 2 bytes/edge instead of 4.
    # receivers are sorted ascending (pack_graphs lexsorts by receiver), so
    # they wire as uint8 DELTAS (cumsum on device); senders stay within the
    # banded window of their receiver (|s - r| < max graph size), so they
    # wire as int8 OFFSETS from the decoded receiver.
    edge_rdelta: Optional[jnp.ndarray] = None   # [E] uint8
    edge_soff: Optional[jnp.ndarray] = None     # [E] int8
    gt_fits: bool = struct.field(pytree_node=False, default=False)


@struct.dataclass
class WireSub:
    node_center: Optional[jnp.ndarray]   # [S] (absolute mode)
    node_orig: Optional[jnp.ndarray]     # [S]
    n_nodes: jnp.ndarray          # [] int32
    senders: Optional[jnp.ndarray]       # [Q]
    receivers: Optional[jnp.ndarray]     # [Q]
    n_edges: jnp.ndarray          # [] int32
    band_col_off: Optional[jnp.ndarray] = None
    # compact mode: centers are sorted (pack_subgraphs center order) ->
    # uint8 deltas; each member's original node lies in the center's graph
    # (|orig - center| < graph size) -> int8 offset; edges delta/offset as
    # in WireGraph.  2 bytes/sub-node + 2 bytes/sub-edge instead of 4 each.
    center_delta: Optional[jnp.ndarray] = None  # [S] uint8
    orig_off: Optional[jnp.ndarray] = None      # [S] int8
    edge_rdelta: Optional[jnp.ndarray] = None   # [Q] uint8
    edge_soff: Optional[jnp.ndarray] = None     # [Q] int8
    gt_fits: bool = struct.field(pytree_node=False, default=False)


class CompactOverflow(ValueError):
    """A value did not fit the compact wire encoding (graph too large for
    int8 sender offsets / uint8 receiver deltas) — use compact=False."""


def _delta_u8(sorted_vals: np.ndarray, n_real: int, what: str) -> np.ndarray:
    """uint8 deltas of a sorted-real-prefix array; the padding tail is
    rewritten to repeat the last real value (delta 0) — padded entries are
    masked by every consumer, only their in-range-ness matters."""
    v = np.asarray(sorted_vals, np.int64).copy()
    if n_real < len(v):
        v[n_real:] = v[n_real - 1] if n_real > 0 else 0
    d = np.diff(v, prepend=0)
    if len(d) and (d.min() < 0 or d.max() > 255):
        raise CompactOverflow(
            f"{what}: delta range [{d.min()}, {d.max()}] outside uint8 "
            "(is the array sorted with a real prefix?)")
    return d.astype(np.uint8)


def _off_i8(vals: np.ndarray, base: np.ndarray, n_real: int,
            what: str) -> np.ndarray:
    """int8 offsets vals - base; padding tail forced to offset 0."""
    v = np.asarray(vals, np.int64).copy()
    b = np.asarray(base, np.int64)
    if n_real < len(v):
        v[n_real:] = b[n_real:]
    o = v - b
    if len(o) and (o.min() < -128 or o.max() > 127):
        raise CompactOverflow(
            f"{what}: offset range [{o.min()}, {o.max()}] outside int8 "
            "(graph larger than the compact wire supports)")
    return o.astype(np.int8)


def _compact_base(sorted_vals: np.ndarray, n_real: int) -> np.ndarray:
    """The padded-rewritten sorted array the deltas reconstruct."""
    v = np.asarray(sorted_vals, np.int64).copy()
    if n_real < len(v):
        v[n_real:] = v[n_real - 1] if n_real > 0 else 0
    return v


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


def to_wire_graph(g: GraphBatch, compact: bool = False) -> WireGraph:
    """Host-side (NumPy) compression of a packed GraphBatch.

    ``compact=True`` delta-encodes the edge lists to 2 bytes/edge (see
    WireGraph) — raises :class:`CompactOverflow` for graphs too large for
    the int8/uint8 ranges (>127-node graphs)."""
    n_cap = g.node_feat.shape[0]
    n_edges = _count(g.edge_mask)
    if compact:
        rdelta = _delta_u8(g.receivers, int(n_edges), "graph receivers")
        soff = _off_i8(g.senders, _compact_base(g.receivers, int(n_edges)),
                       int(n_edges), "graph senders")
        senders = receivers = None
    else:
        rdelta = soff = None
        senders = _shrink_idx(g.senders, n_cap)
        receivers = _shrink_idx(g.receivers, n_cap)
    return WireGraph(
        node_feat=_shrink_feat(g.node_feat),
        node_graph=_shrink_idx(g.node_graph, g.graph_mask.shape[0]),
        senders=senders,
        receivers=receivers,
        n_nodes=_count(g.node_mask),
        n_edges=n_edges,
        n_graphs=_count(g.graph_mask),
        num_graphs_cap=int(g.graph_mask.shape[0]),
        labels=None if g.labels is None else np.asarray(g.labels),
        label_mask=(None if g.label_mask is None
                    else np.asarray(g.label_mask)),
        band_col_off=(None if g.band_col_off is None
                      else np.asarray(g.band_col_off)),
        edge_rdelta=rdelta,
        edge_soff=soff,
        gt_fits=g.gt_fits,
    )


def to_wire_sub(sub: SubgraphBatch, compact: bool = False) -> WireSub:
    if sub.node_feat is not None:
        raise ValueError("wire format expects the node_feat=None "
                         "(derive-on-device) SubgraphBatch layout")
    s_cap = sub.node_center.shape[0]
    n_nodes = _count(sub.node_mask)
    n_edges = _count(sub.edge_mask)
    if compact:
        cdelta = _delta_u8(sub.node_center, int(n_nodes), "sub centers")
        ooff = _off_i8(sub.node_orig,
                       _compact_base(sub.node_center, int(n_nodes)),
                       int(n_nodes), "sub node_orig")
        rdelta = _delta_u8(sub.receivers, int(n_edges), "sub receivers")
        soff = _off_i8(sub.senders,
                       _compact_base(sub.receivers, int(n_edges)),
                       int(n_edges), "sub senders")
        return WireSub(
            node_center=None, node_orig=None, n_nodes=n_nodes,
            senders=None, receivers=None, n_edges=n_edges,
            band_col_off=(None if sub.band_col_off is None
                          else np.asarray(sub.band_col_off)),
            center_delta=cdelta, orig_off=ooff,
            edge_rdelta=rdelta, edge_soff=soff, gt_fits=sub.gt_fits)
    # node_center/node_orig index the OWNING batch's node space; their
    # capacity bound is the owning node cap, which callers don't have
    # here — use the observed max (safe: dtype chosen from actual values)
    c_max = int(np.asarray(sub.node_center).max(initial=0))
    o_max = int(np.asarray(sub.node_orig).max(initial=0))
    return WireSub(
        node_center=_shrink_idx(sub.node_center, c_max + 1),
        node_orig=_shrink_idx(sub.node_orig, o_max + 1),
        n_nodes=n_nodes,
        senders=_shrink_idx(sub.senders, s_cap),
        receivers=_shrink_idx(sub.receivers, s_cap),
        n_edges=n_edges,
        band_col_off=(None if sub.band_col_off is None
                      else np.asarray(sub.band_col_off)),
        gt_fits=sub.gt_fits,
    )


def _decode_delta(rdelta, soff):
    """(receivers, senders) from the compact encoding, under jit."""
    r = jnp.cumsum(rdelta.astype(jnp.int32))
    s = r + soff.astype(jnp.int32)
    return r, s


def from_wire_graph(w: WireGraph) -> GraphBatch:
    """Device-side reconstitution (runs under jit).

    Compact-mode padding edges decode as self-loops on the LAST REAL
    receiver (not the padding node the packer used) — every consumer
    weights edges by edge_mask, so only in-range-ness of padded values
    matters (verified by tests/test_wire.py parity cases)."""
    n_cap = w.node_graph.shape[0]
    if w.edge_rdelta is not None:
        receivers, senders = _decode_delta(w.edge_rdelta, w.edge_soff)
    else:
        senders = w.senders.astype(jnp.int32)
        receivers = w.receivers.astype(jnp.int32)
    e_cap = receivers.shape[0]
    return GraphBatch(
        node_feat=w.node_feat.astype(jnp.float32),
        node_graph=w.node_graph.astype(jnp.int32),
        node_mask=jnp.arange(n_cap, dtype=jnp.int32) < w.n_nodes,
        senders=senders,
        receivers=receivers,
        edge_mask=jnp.arange(e_cap, dtype=jnp.int32) < w.n_edges,
        graph_mask=(jnp.arange(w.num_graphs_cap, dtype=jnp.int32)
                    < w.n_graphs),
        labels=w.labels,
        label_mask=w.label_mask,
        band_col_off=w.band_col_off,
        gt_fits=w.gt_fits,
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


def pack_bytes_grouped(group, spec: ByteSpec) -> np.ndarray:
    """``pack_bytes`` over K per-batch pytrees WITHOUT stacking them
    first: each batch's leaves are written directly into their [k] slice
    of the combined buffer.  Skips the intermediate ``np.stack`` copy of
    every leaf (~35 ms + ~65 ms of two-pass copying per 32-batch
    superbatch on the 2-core bench host — the host pack path is the
    sustained loop's bottleneck, round-5 profile).  ``spec`` is the same
    combined ByteSpec the stacked form uses; K = spec leaf leading dim."""
    import jax.tree_util as _jtu

    flat = [_jtu.tree_leaves(t) for t in group]
    k_count = len(group)
    buf = np.zeros(spec.total, np.uint8)
    for i, (dt, shape, off, nb) in enumerate(spec.leaves):
        assert shape[0] == k_count, \
            f"spec leaf {i} leading dim {shape[0]} != group size {k_count}"
        per = nb // k_count
        view = buf[off:off + nb].reshape(k_count, per)
        for k in range(k_count):
            a = np.ascontiguousarray(np.asarray(flat[k][i])).reshape(-1)
            assert str(a.dtype) == dt, \
                f"leaf {i} batch {k}: {a.dtype} vs spec {dt}"
            view[k] = a.view(np.uint8)
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
    if w.center_delta is not None:
        node_center = jnp.cumsum(w.center_delta.astype(jnp.int32))
        node_orig = node_center + w.orig_off.astype(jnp.int32)
        receivers, senders = _decode_delta(w.edge_rdelta, w.edge_soff)
    else:
        node_center = w.node_center.astype(jnp.int32)
        node_orig = w.node_orig.astype(jnp.int32)
        senders = w.senders.astype(jnp.int32)
        receivers = w.receivers.astype(jnp.int32)
    s_cap = node_center.shape[0]
    q_cap = senders.shape[0]
    return SubgraphBatch(
        node_feat=None,
        node_center=node_center,
        node_orig=node_orig,
        node_mask=jnp.arange(s_cap, dtype=jnp.int32) < w.n_nodes,
        senders=senders,
        receivers=receivers,
        edge_mask=jnp.arange(q_cap, dtype=jnp.int32) < w.n_edges,
        band_col_off=w.band_col_off,
        gt_fits=w.gt_fits,
    )
