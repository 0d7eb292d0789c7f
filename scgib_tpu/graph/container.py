"""Graph batch containers — the TPU-native replacement for ``dgl.batch``.

The reference framework (S-CGIB) represents a minibatch of molecular graphs as
a DGL batched graph (``molecules.py:349-362`` collate + ``dgl.batch``) whose
node/edge counts vary per batch.  On TPU every array that reaches ``jit`` must
have a static shape, so we instead pack a batch into fixed-capacity padded
buffers:

* nodes are concatenated in graph order and padded to ``num_nodes`` capacity,
* edges are stored as COO (``senders``/``receivers``) sorted by receiver so
  segment reductions can use ``indices_are_sorted=True``,
* ``node_graph`` holds the graph id (segment id) of every node,
* boolean validity masks distinguish real entries from padding.

Two containers exist:

``GraphBatch``
    a batch of B graphs (the analog of the reference's ``batch_g``).

``SubgraphBatch``
    the flattened per-node k-hop ego-nets (the analog of the reference's
    ``flatten_batch_subgraphs`` built in ``train_*py`` via
    ``dgl.batch(list(chain.from_iterable(batch_subgraphs)))``).  Its segment
    ids map each sub-node to the *center node's global index* in the owning
    ``GraphBatch`` so that one segment-sum produces the per-node candidate
    embeddings (reference ``models.py:724-725``).

Both are registered JAX pytrees (via ``flax.struct``), so they can be passed
through ``jit`` / ``shard_map`` / ``grad`` directly.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GraphBatch:
    """A fixed-shape padded batch of graphs.

    Shapes (capacities are static):
      node_feat:   [N, F]  float — node features (padding rows are zero)
      node_graph:  [N]     int32 — graph id per node (padding rows point at
                                   graph 0 but are masked out)
      node_mask:   [N]     bool  — True for real nodes
      senders:     [E]     int32 — COO source node index (global)
      receivers:   [E]     int32 — COO destination node index (global),
                                   sorted ascending so segment ops are sorted
      edge_mask:   [E]     bool  — True for real edges
      graph_mask:  [G]     bool  — True for real graphs
      labels:      [G, T]  float — optional per-graph labels (zeros if absent)
      label_mask:  [G, T]  bool  — True where a label is present (NaN-aware
                                   multi-task labels, cf. MetricWrapper.py)
    """

    node_feat: jnp.ndarray
    node_graph: jnp.ndarray
    node_mask: jnp.ndarray
    senders: jnp.ndarray
    receivers: jnp.ndarray
    edge_mask: jnp.ndarray
    graph_mask: jnp.ndarray
    labels: Optional[jnp.ndarray] = None
    label_mask: Optional[jnp.ndarray] = None
    # optional banded block-dense adjacency (graph/banded.py): when set,
    # GIN aggregation uses per-tile dense MXU matmuls instead of
    # gather + segment-sum (measured ~7.6x faster per layer on v5e)
    band_blocks: Optional[jnp.ndarray] = None    # [T, tile, band]
    band_col_off: Optional[jnp.ndarray] = None   # [T]
    # optional k-step transition targets for recons_type='logM'
    # (graph/transition.py::pack_logm_targets): block-diagonal padded
    # logM matrices + the per-graph 1/n^2 weight mask.  O(k N^2) memory —
    # only attach when the logM loss is in use (batch_iterator(logm_k=k))
    logm_targets: Optional[jnp.ndarray] = None   # [k, N, N]
    logm_weights: Optional[jnp.ndarray] = None   # [N, N]
    # STATIC: every graph is small enough (<= 33 nodes) that the
    # narrower (tile=64, band=128) banded geometry provably fits — the
    # graph-transformer flash kernels use it to halve their dense-window
    # (VPU) volume.  Dataset-stable, so one jit trace per dataset.
    gt_fits: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_nodes(self) -> int:
        return self.node_feat.shape[0]

    @property
    def num_edges(self) -> int:
        return self.senders.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[0]

    @property
    def feat_dim(self) -> int:
        return self.node_feat.shape[-1]

    def node_counts(self) -> jnp.ndarray:
        """Per-graph real node counts, [G] (reference batch_num_nodes())."""
        import jax

        ones = self.node_mask.astype(jnp.int32)
        return jax.ops.segment_sum(ones, self.node_graph,
                                   num_segments=self.num_graphs)


@struct.dataclass
class SubgraphBatch:
    """Flattened per-node ego-net batch with fixed capacities.

    Each real node v of the owning GraphBatch has one ego-net; all ego-nets
    are concatenated.  Segment ids map sub-nodes to their center node's
    global index (0..N-1 of the owning batch).

    Shapes:
      node_feat:    [S, F] float or None — features of sub-nodes (copies
                                   of the original node's features).  None
                                   (default wire format) means "derive on
                                   device as g.node_feat[node_orig]" —
                                   saves the largest host->device array
      node_center:  [S]    int32 — center-node global index per sub-node
      node_orig:    [S]    int32 — original node global index per sub-node
                                   (gather map, lets us rebuild features on
                                   device instead of storing copies)
      node_mask:    [S]    bool
      senders:      [Q]    int32 — COO over the flattened sub-node space
      receivers:    [Q]    int32 — sorted ascending
      edge_mask:    [Q]    bool
    """

    node_feat: Optional[jnp.ndarray]
    node_center: jnp.ndarray
    node_orig: jnp.ndarray
    node_mask: jnp.ndarray
    senders: jnp.ndarray
    receivers: jnp.ndarray
    edge_mask: jnp.ndarray
    band_blocks: Optional[jnp.ndarray] = None    # see GraphBatch
    band_col_off: Optional[jnp.ndarray] = None
    # STATIC: every ego-net <= 33 sub-nodes -> the (64, 128) geometry
    # fits (see GraphBatch.gt_fits)
    gt_fits: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_nodes(self) -> int:
        return self.node_center.shape[0]

    @property
    def num_edges(self) -> int:
        return self.senders.shape[0]


@struct.dataclass
class DenseSubgraphBatch:
    """Dense-block ego-net batch: one fixed-size slot per center node.

    The TPU-native alternative to the COO ``SubgraphBatch`` for small
    ego-nets (k=1 molecular: |ego| = 1+deg <= ~8): row ``c`` holds the
    ego-net of the owning GraphBatch's global node ``c``, padded to
    ``max_sub`` members, with a dense [S, S] adjacency block.  All message
    passing becomes batched dense einsum on the MXU — no gather/scatter,
    no segment ops (SURVEY.md §7.3 'ego-net subgraph batch' hard part).

    Shapes (C = owning batch node capacity, S = max_sub):
      node_feat: [C, S, F] float — member features (zeros on padding)
      node_orig: [C, S]    int32 — member's global node id (gather map)
      adj:       [C, S, S] float — 0/1 within-ego adjacency blocks
      mask:      [C, S]    bool  — True for real members (all-False rows
                                   for padded centers)
    """

    node_feat: jnp.ndarray
    node_orig: jnp.ndarray
    adj: jnp.ndarray
    mask: jnp.ndarray

    @property
    def num_centers(self) -> int:
        return self.node_feat.shape[0]

    @property
    def max_sub(self) -> int:
        return self.node_feat.shape[1]
