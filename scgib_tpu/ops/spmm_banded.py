"""Banded SpMM — XLA reference implementation.

``banded_spmm(blocks, col_off, h)`` computes the neighbor aggregation
``agg[v] = sum_{(u->v) in E} h[u]`` from the banded block-dense layout
(graph/banded.py): per row-tile, slice the band window of ``h`` and do a
dense [tile, band] @ [band, d] matmul — MXU work instead of
gather + scatter.  The Pallas version (ops/pallas/banded.py) fuses the
window staging and the GIN MLP; this one is the semantics reference and
the CPU/test path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _banded_spmm_impl(blocks, col_off, h):
    n_tiles, tile, band = blocks.shape
    d = h.shape[-1]

    def one(block, off):
        win = jax.lax.dynamic_slice(h, (off, 0), (band, d))
        return jnp.dot(block, win, preferred_element_type=h.dtype)

    out = jax.vmap(one)(blocks, col_off)          # [T, tile, d]
    return out.reshape(n_tiles * tile, d)


@jax.custom_vjp
def banded_spmm(blocks: jnp.ndarray, col_off: jnp.ndarray,
                h: jnp.ndarray) -> jnp.ndarray:
    """[T, tile, band] x [T] x [N, d] -> [N, d] neighbor sums.

    Custom VJP: d/dh of (A h) is A^T g, and the packers ALWAYS symmetrize
    edges (``symmetrize_edges`` mirrors the reference's
    ``dgl.to_bidirected``, util.py:318), so the backward is the SAME
    banded matmul — without this, autodiff transposes the window
    ``dynamic_slice`` into serialized scatter updates that cost ~10x the
    forward (measured via bench.py).  Do NOT use on asymmetric adjacency.
    """
    return _banded_spmm_impl(blocks, col_off, h)


def _fwd(blocks, col_off, h):
    return _banded_spmm_impl(blocks, col_off, h), (blocks, col_off)


def _bwd(res, g):
    blocks, col_off = res
    return None, None, _banded_spmm_impl(blocks, col_off, g)


banded_spmm.defvjp(_fwd, _bwd)
