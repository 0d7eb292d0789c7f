"""Banded block-dense adjacency — the TPU-native SpMM layout.

Because the packer lays graphs out contiguously, every edge (u, v) of a
packed batch satisfies |u - v| < max graph size.  The adjacency is
therefore a banded matrix: tiling rows into blocks of ``tile`` and giving
each row-tile a dense [tile, band] slab whose columns start at
``col_off[t]`` turns SpMM into per-tile dense matmuls

    agg[t*tile:(t+1)*tile] = blocks[t] @ h[col_off[t] : col_off[t]+band]

— pure MXU work, no gather or scatter (SURVEY.md §7.2 'Pallas versions
tuned for padded CSR').  The Pallas kernel in ``ops.pallas.banded`` and
the XLA reference in ``ops.spmm_banded`` both consume this layout.

Fits whenever the largest graph has at most ``band - tile`` nodes (64-node
molecules with the defaults); ``fits_band`` reports feasibility so callers
can fall back to COO for outliers (e.g. unbucketed peptides).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class BandedAdjacency:
    """blocks: [T, tile, band] float32 0/1; col_off: [T] int32 (multiples
    of ``align``); num_nodes: padded node capacity (= T * tile)."""

    blocks: np.ndarray
    col_off: np.ndarray
    num_nodes: int

    @property
    def tile(self) -> int:
        return self.blocks.shape[1]

    @property
    def band(self) -> int:
        return self.blocks.shape[2]


def fits_band(senders: np.ndarray, receivers: np.ndarray,
              tile: int = 128, band: int = 256,
              align: int = 64) -> bool:
    """True iff every edge's sender falls inside its receiver-tile's
    band window."""
    t0 = (receivers // tile) * tile
    lo = np.maximum(t0 + tile // 2 - band // 2, 0)
    lo = (lo // align) * align
    return bool(np.all((senders >= lo) & (senders < lo + band)))


def banded_col_off(num_nodes: int, tile: int = 128, band: int = 256,
                   align: int = 64) -> np.ndarray:
    """The [T] window offsets — a pure function of the node capacity, so
    the host can ship this tiny array and build the blocks on device."""
    n_tiles = num_nodes // tile
    all_t0 = np.arange(n_tiles, dtype=np.int64) * tile
    all_lo = np.maximum(all_t0 + tile // 2 - band // 2, 0)
    col_off = (all_lo // align) * align
    return np.minimum(col_off, max(num_nodes - band, 0)).astype(np.int32)


def fits_band_masked(senders: np.ndarray, receivers: np.ndarray,
                     edge_mask: Optional[np.ndarray], num_nodes: int,
                     tile: int = 128, band: int = 256,
                     align: int = 64) -> bool:
    """Host-side feasibility check against the *clamped* windows (the ones
    ``banded_col_off`` produces), ignoring masked padding edges."""
    if num_nodes % tile != 0 or num_nodes < band:
        return False
    s = np.asarray(senders)
    r = np.asarray(receivers)
    if edge_mask is not None:
        keep = np.asarray(edge_mask, bool)
        s, r = s[keep], r[keep]
    if not len(s):
        return True
    off = banded_col_off(num_nodes, tile, band, align)
    col = s - off[r // tile]
    return bool((col.min() >= 0) and (col.max() < band))


def build_blocks_jax(senders, receivers, edge_mask, col_off,
                     num_nodes: int, tile: int = 128, band: int = 256):
    """Device-side banded block construction from the COO edge list.

    Shipping the dense [T, tile, band] blocks from the host costs ~20 MB
    per batch over the host link; the COO lists are ~100 KB.  This builds
    the identical blocks under ``jit`` with one XLA scatter-add (masked
    padding edges contribute weight 0; any out-of-window index is dropped
    by scatter semantics, and the host packer only selects this mode after
    ``fits_band_masked``).

    Blocks are emitted **bfloat16**: adjacency entries are small integer
    counts (0/1 for the deduped symmetric packers), exactly representable
    in bf16, and the SpMM kernels' MXU passes round multiplicands to bf16
    anyway — so the f32 block buffer was pure HBM traffic.  Halving it
    takes the fused conv layers from block-read-bound at ~16 MB/layer to
    ~8 MB with bitwise-identical results (round-4 profile)."""
    import jax.numpy as jnp

    n_tiles = num_nodes // tile
    t_idx = receivers // tile
    row = receivers - t_idx * tile
    col = senders - col_off[t_idx]
    w = edge_mask.astype(jnp.bfloat16) if edge_mask is not None else \
        jnp.ones(senders.shape, jnp.bfloat16)
    blocks = jnp.zeros((n_tiles, tile, band), jnp.bfloat16)
    return blocks.at[t_idx, row, col].add(w, mode="drop")


def pack_banded(senders: np.ndarray, receivers: np.ndarray,
                edge_mask: Optional[np.ndarray], num_nodes: int,
                tile: int = 128, band: int = 256,
                align: int = 64) -> BandedAdjacency:
    """Build the banded layout from a (masked) COO edge list.

    Raises ValueError if an edge escapes its band (check ``fits_band``
    first, or catch and fall back to the COO segment path).
    """
    assert num_nodes % tile == 0, "node capacity must be a tile multiple"
    assert band % align == 0 and tile % align == 0
    n_tiles = num_nodes // tile

    if edge_mask is not None:
        keep = np.asarray(edge_mask, dtype=bool)
        senders = np.asarray(senders)[keep]
        receivers = np.asarray(receivers)[keep]

    # window offsets first (vectorized over tiles, no edge pass needed),
    # clamped so the window never reads past the node array
    all_t0 = np.arange(n_tiles, dtype=np.int64) * tile
    all_lo = np.maximum(all_t0 + tile // 2 - band // 2, 0)
    col_off = (all_lo // align) * align
    col_off = np.minimum(col_off, max(num_nodes - band, 0)).astype(np.int32)

    t_idx = receivers // tile
    t0 = t_idx * tile
    col = senders - col_off[t_idx]
    if len(col) and (col.min() < 0 or col.max() >= band):
        raise ValueError(
            "edge escapes band window; increase band or use the COO path")

    # accumulate (duplicate edges add, matching segment-sum semantics);
    # single pass — col_off needed no edge-dependent first build
    blocks = np.zeros((n_tiles, tile, band), dtype=np.float32)
    lin = (t_idx * tile + (receivers - t0)) * band + col
    np.add.at(blocks.reshape(-1), lin, 1.0)

    return BandedAdjacency(blocks=blocks, col_off=col_off,
                           num_nodes=num_nodes)


# --- graph-transformer geometry --------------------------------------------
#
# The GT flash kernels (ops/pallas/gt_flash.py) are VPU-bound on the dense
# [tile, band] window, so they prefer a NARROWER geometry than the conv
# kernels: tile=64, band=128, align=8 (f32 sublane).  The window
# [t0 - 32, t0 + 96) provably contains every edge when no graph (or
# ego-net) exceeds tile/2 + 1 = 33 nodes: an edge's endpoints differ by
# at most n-1 <= 32.  The packers record this DATASET-STABLE fact as the
# static ``gt_fits`` flag so the encoder picks the geometry at trace time.

GT_TILE = 64
GT_BAND = 128
GT_ALIGN = 8


def gt_band_fits(max_component: int, cap: int) -> bool:
    """True when the (GT_TILE, GT_BAND) geometry provably fits every
    batch whose largest graph/ego-net has ``max_component`` nodes."""
    return (cap % GT_TILE == 0 and cap >= GT_BAND
            and max_component <= GT_TILE // 2 + 1)
