"""Sparse message passing (SpMM) and edge scoring (SDDMM) primitives.

These are the TPU-native replacements for the DGL C++/CUDA kernels the
reference leans on (SURVEY.md §2.4):

  * ``GINConv``'s copy-u/sum SpMM                  (reference models.py:63,69)
  * ``GraphConv`` symmetric-normalized SpMM        (reference models.py:78-88)
  * ``SAGEConv`` mean-aggregation SpMM             (reference models.py:94-104)
  * ``apply_edges(src_dot_dst)`` SDDMM + u_mul_e   (reference models.py:895-903)

Implementation: gather source rows (``jnp.take``) then segment-sum into the
destination — XLA compiles this to fused gather + sorted scatter-add, which on
TPU keeps everything in registers/VMEM between the two.  Edges are sorted by
receiver at pack time, so the scatter uses the sorted fast path.

A Pallas kernel variant for the hot fused gather→scatter is provided in
``scgib_tpu.ops.pallas`` and can be enabled via ``use_pallas=True`` on
supported shapes; semantics are identical.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .segment import segment_sum, segment_count


def gather_sum(node_feat: jnp.ndarray,
               senders: jnp.ndarray,
               receivers: jnp.ndarray,
               num_nodes: int,
               edge_mask: Optional[jnp.ndarray] = None,
               edge_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """sum_{(u -> v) in E} w_uv * x_u  for every node v.   [N,F] -> [N,F].

    The copy-u/sum message passing at the heart of GIN/GCN.
    """
    msg = jnp.take(node_feat, senders, axis=0)
    if edge_weight is not None:
        msg = msg * edge_weight.reshape(edge_weight.shape + (1,) * (msg.ndim - edge_weight.ndim))
    return segment_sum(msg, receivers, num_nodes, mask=edge_mask)


def gather_mean(node_feat: jnp.ndarray,
                senders: jnp.ndarray,
                receivers: jnp.ndarray,
                num_nodes: int,
                edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """mean over in-neighbors (SAGE 'mean' aggregator). Zero for isolated."""
    total = gather_sum(node_feat, senders, receivers, num_nodes, edge_mask)
    deg = segment_count(receivers, num_nodes, mask=edge_mask)
    return total / jnp.maximum(deg, 1.0)[:, None]


def in_degrees(receivers: jnp.ndarray,
               num_nodes: int,
               edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    return segment_count(receivers, num_nodes, mask=edge_mask)


def gcn_norm_sum(node_feat: jnp.ndarray,
                 senders: jnp.ndarray,
                 receivers: jnp.ndarray,
                 num_nodes: int,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Symmetric-normalized aggregation D^{-1/2} A D^{-1/2} x.

    Matches DGL ``GraphConv(norm='both', allow_zero_in_degree=True)``
    (reference models.py:78-80): out-degree-normalize the source features,
    aggregate, then in-degree-normalize the result; zero-degree nodes yield 0.
    """
    out_deg = segment_count(senders, num_nodes, mask=edge_mask)
    in_deg = segment_count(receivers, num_nodes, mask=edge_mask)
    src_norm = jnp.where(out_deg > 0, jax_rsqrt(out_deg), 0.0)
    dst_norm = jnp.where(in_deg > 0, jax_rsqrt(in_deg), 0.0)
    h = node_feat * src_norm[:, None]
    h = gather_sum(h, senders, receivers, num_nodes, edge_mask)
    return h * dst_norm[:, None]


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / jnp.sqrt(jnp.maximum(x, 1e-30))


def sddmm_dot(src_feat: jnp.ndarray,
              dst_feat: jnp.ndarray,
              senders: jnp.ndarray,
              receivers: jnp.ndarray) -> jnp.ndarray:
    """Per-edge dot products  s_e = <x_{u_e}, y_{v_e}>  (sum over last axis).

    Matches the reference's ``apply_edges(src_dot_dst('K_h','Q_h','score'))``
    (models.py:994-998).  Supports a heads axis: [N,H,D] inputs give [E,H].
    """
    a = jnp.take(src_feat, senders, axis=0)
    b = jnp.take(dst_feat, receivers, axis=0)
    return jnp.sum(a * b, axis=-1)
