"""Flash-style Pallas kernels for the graph-transformer edge attention.

The reference computes per-edge attention with DGL's fused kernels:
SDDMM scores -> exp(clamp(score/sqrt(d), -5, 5)) -> per-destination
normalize -> weighted aggregation (models.py:895-917).  Our banded XLA
form (ops/spmm_banded.py::gt_banded_attention) is numerically faithful
but materializes [T, H, tile, band] score tensors in HBM — ~134 MB per
layer per direction at bench shapes, which made the Transformer encoder
the one family below the reference baseline (43.8 ms/step, round-3
verdict).

These kernels never materialize scores outside VMEM:

  forward   — per row-tile, per head: S = Q_t K_winᵀ/sqrt(hd) on the
              MXU, E = exp(clip(S)) ⊙ A_block, z = rowsum(E),
              out = (E/(z+eps)) V_win.  Emits z (the normalizers) for
              the backward.
  backward  — two kernels, the classic flash split:
              B1 (row tiles): recompute E; G = g V_winᵀ;
                 rho_i = sum_j G_ij W_ij;   dS = E⊙1[|S|<=c]⊙(G-rho)/ (z+eps);
                 dq = dS K_win / sqrt(hd).  Emits rho.
              B2 (column tiles): because the packers symmetrize edges,
                 the rows attending to column-tile tc lie inside the
                 SAME band window col_off[tc] (A = Aᵀ ⇒ the transposed
                 gate is blocks[tc]ᵀ).  Recomputes Sᵀ from the q/g/z/rho
                 windows and the k/v tile; dv = Wᵀ g_win,
                 dk = dSᵀᵀ q_win / sqrt(hd).

Numerics match the XLA path's autodiff up to reduction order
(tests/test_graph_transformer.py parity cases, interpret mode on CPU;
on-chip probes in TPU_PARITY_r04).  The un-shifted exp (no max
subtraction) is kept bit-faithful to the reference's clamp+exp softmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded import _TILES_PER_PROGRAM, _vmem_limit


import os as _os


def _bf16_default() -> bool:
    # bf16 multiplicands (f32 accumulation) in the score/output dots —
    # the same native MXU mode XLA's DEFAULT precision gives every flax
    # Dense in the model on TPU.  Mosaic's f32 dot is full precision
    # (and ~3x the passes), so without this the flash kernels would be
    # *more* precise and slower than the rest of the compute path.
    # SCGIB_GT_BF16=0 forces f32.  The choice is threaded as an explicit
    # STATIC argument (not a module global): jax caches jaxprs per
    # (function, avals), so a global flip would silently reuse the first
    # trace.
    return _os.environ.get("SCGIB_GT_BF16", "1") == "1"


def _hdot(a, b, bf16):
    """Contract the trailing dim of both operands (no transposes)."""
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _cdot(a, b, bf16=False):
    """Contract the LEADING dim of both operands: [m, i] x [m, j] -> [i, j]."""
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _ones_bd(num_heads, band, dtype=jnp.float32):
    """[H*band, H] block-diagonal ones: e_cat @ ones_bd = per-head row
    sums; dot_general(x, ones_bd, contract last) broadcasts per-head
    scalars back across their band columns — both MXU ops instead of
    2*H small VPU reductions.  Loop-invariant (built from iota), so
    Mosaic hoists it out of the tile loop."""
    r = jax.lax.broadcasted_iota(jnp.int32, (num_heads * band, num_heads),
                                 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (num_heads * band, num_heads),
                                 1)
    return (r // band == c).astype(dtype)


def _head_mask(num_heads, rows, hd, dtype=jnp.float32):
    """[H*rows, H*hd] selector: 1 where row block h meets column head h.
    ``concat([x]*H, 0) * _head_mask`` turns [rows, H*hd] x-windows into
    the block-diagonal operand that computes ALL heads' scores in ONE
    MXU dot — Mosaic code here is latency-bound on op count, not FLOPs,
    so an 8x-redundant big dot beats 8 tiny dots (round-4 notes)."""
    r = jax.lax.broadcasted_iota(jnp.int32,
                                 (num_heads * rows, num_heads * hd), 0)
    c = jax.lax.broadcasted_iota(jnp.int32,
                                 (num_heads * rows, num_heads * hd), 1)
    return (r // rows == c // hd).astype(dtype)


def _bd(x, num_heads, hd):
    """Block-diagonal head expansion: [rows, H*hd] -> [H*rows, H*hd]."""
    rows = x.shape[0]
    return (jnp.concatenate([x] * num_heads, axis=0)
            * _head_mask(num_heads, rows, hd))


def _inv_big(z, ones, eps):
    """1/(z+eps) per (row, head), broadcast across that head's columns."""
    inv = 1.0 / (z + eps)
    return jax.lax.dot_general(inv, ones, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _fwd_kernel(off_ref, q_ref, k_ref, v_ref, blocks_ref, out_ref, z_ref,
                *, num_heads, hd, clamp, eps, scale, bf16):
    p = pl.program_id(0)
    tp, tile, band = blocks_ref.shape
    ones_bd = _ones_bd(num_heads, band)
    for j in range(tp):
        t = p * tp + j
        off = pl.multiple_of(off_ref[t], 8)
        blk = blocks_ref[j].astype(jnp.float32)
        q_t = q_ref[pl.ds(t * tile, tile), :]             # [tile, H*hd]
        k_bd = _bd(k_ref[pl.ds(off, band), :], num_heads, hd)
        s_cat = _hdot(q_t, k_bd, bf16) * scale                  # [tile, H*band]
        e_cat = jnp.exp(jnp.clip(s_cat, -clamp, clamp))
        e_cat = e_cat * jnp.concatenate([blk] * num_heads, axis=1)
        z = jnp.dot(e_cat, ones_bd,
                    preferred_element_type=jnp.float32)   # [tile, H]
        w_cat = e_cat * _inv_big(z, ones_bd, eps)
        v_bd = _bd(v_ref[pl.ds(off, band), :], num_heads, hd)
        out_ref[pl.ds(j * tile, tile), :] = jnp.dot(
            w_cat.astype(jnp.bfloat16) if bf16 else w_cat,
            v_bd.astype(jnp.bfloat16) if bf16 else v_bd,
            preferred_element_type=jnp.float32)
        z_ref[pl.ds(j * tile, tile), :] = z


def _bwd_rows_kernel(off_ref, q_ref, k_ref, v_ref, g_ref, z_ref,
                     blocks_ref, dq_ref, rho_ref,
                     *, num_heads, hd, clamp, eps, scale, bf16):
    p = pl.program_id(0)
    tp, tile, band = blocks_ref.shape
    ones_bd = _ones_bd(num_heads, band)
    for j in range(tp):
        t = p * tp + j
        off = pl.multiple_of(off_ref[t], 8)
        blk = blocks_ref[j].astype(jnp.float32)
        q_t = q_ref[pl.ds(t * tile, tile), :]
        g_t = g_ref[pl.ds(t * tile, tile), :]
        zb = z_ref[pl.ds(t * tile, tile), :]              # [tile, H]
        k_bd = _bd(k_ref[pl.ds(off, band), :], num_heads, hd)
        v_bd = _bd(v_ref[pl.ds(off, band), :], num_heads, hd)
        s_cat = _hdot(q_t, k_bd, bf16) * scale                  # [tile, H*band]
        G_cat = _hdot(g_t, v_bd, bf16)
        e_cat = jnp.exp(jnp.clip(s_cat, -clamp, clamp))
        e_cat = e_cat * jnp.concatenate([blk] * num_heads, axis=1)
        invbig = _inv_big(zb, ones_bd, eps)
        w_cat = e_cat * invbig
        rho = jnp.dot(G_cat * w_cat, ones_bd,
                      preferred_element_type=jnp.float32)  # [tile, H]
        rhobig = jax.lax.dot_general(
            rho, ones_bd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        inclip = ((s_cat >= -clamp) & (s_cat <= clamp)).astype(jnp.float32)
        dS_cat = e_cat * inclip * (G_cat - rhobig) * invbig
        dq_ref[pl.ds(j * tile, tile), :] = jnp.dot(
            dS_cat.astype(jnp.bfloat16) if bf16 else dS_cat,
            k_bd.astype(jnp.bfloat16) if bf16 else k_bd,
            preferred_element_type=jnp.float32) * scale
        rho_ref[pl.ds(j * tile, tile), :] = rho


def _bwd_merged_kernel(off_ref, q_ref, k_ref, v_ref, g_ref, z_ref,
                       blocks_ref, dq_ref, dk_ref, dv_ref,
                       *, num_heads, hd, clamp, eps, scale, bf16):
    """Single-pass backward (the round-5 default): the row-tile pass
    already holds dS and W in registers, so instead of a second kernel
    recomputing them transposed (the round-4 two-pass split), this one
    scatter-accumulates each tile's dk/dv contributions into VMEM-
    resident full outputs.  Safe because the Pallas TPU grid executes
    programs SEQUENTIALLY on a core — overlapping band windows
    read-modify-write without races.  Kills the transposed-gate build,
    the rho emit/reload, and ~9 recompute ops per tile of the old column
    pass (~3.18 ms -> see PERF.md for the measured step)."""
    p = pl.program_id(0)
    tp, tile, band = blocks_ref.shape
    ones_bd = _ones_bd(num_heads, band)

    @pl.when(p == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    for j in range(tp):
        t = p * tp + j
        off = pl.multiple_of(off_ref[t], 8)
        blk = blocks_ref[j].astype(jnp.float32)
        q_t = q_ref[pl.ds(t * tile, tile), :]
        g_t = g_ref[pl.ds(t * tile, tile), :]
        zb = z_ref[pl.ds(t * tile, tile), :]              # [tile, H]
        k_bd = _bd(k_ref[pl.ds(off, band), :], num_heads, hd)
        v_bd = _bd(v_ref[pl.ds(off, band), :], num_heads, hd)
        s_cat = _hdot(q_t, k_bd, bf16) * scale            # [tile, H*band]
        G_cat = _hdot(g_t, v_bd, bf16)
        e_cat = jnp.exp(jnp.clip(s_cat, -clamp, clamp))
        e_cat = e_cat * jnp.concatenate([blk] * num_heads, axis=1)
        invbig = _inv_big(zb, ones_bd, eps)
        w_cat = e_cat * invbig
        rho = jnp.dot(G_cat * w_cat, ones_bd,
                      preferred_element_type=jnp.float32)  # [tile, H]
        rhobig = jax.lax.dot_general(
            rho, ones_bd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        inclip = ((s_cat >= -clamp) & (s_cat <= clamp)).astype(jnp.float32)
        dS_cat = e_cat * inclip * (G_cat - rhobig) * invbig
        dq_ref[pl.ds(j * tile, tile), :] = jnp.dot(
            dS_cat.astype(jnp.bfloat16) if bf16 else dS_cat,
            k_bd.astype(jnp.bfloat16) if bf16 else k_bd,
            preferred_element_type=jnp.float32) * scale
        # dk[j] = sum_i dS[i, j] q[i] * scale, dv[j] = sum_i W[i, j] g[i]
        # for rows i of THIS tile: contract the tile axis, head-mask the
        # [H*band, H*hd] stacks (off-diagonal head pairings are garbage),
        # collapse the head blocks, and accumulate into the band window.
        dk_stack = _cdot(dS_cat, q_t, bf16)               # [H*band, H*hd]
        dv_stack = _cdot(w_cat, g_t, bf16)
        hm = _head_mask(num_heads, band, hd)
        dk_stack = dk_stack * hm
        dv_stack = dv_stack * hm
        dk_w = dk_stack[0:band, :]
        dv_w = dv_stack[0:band, :]
        for h in range(1, num_heads):
            dk_w = dk_w + dk_stack[h * band:(h + 1) * band, :]
            dv_w = dv_w + dv_stack[h * band:(h + 1) * band, :]
        dk_ref[pl.ds(off, band), :] = (
            dk_ref[pl.ds(off, band), :] + dk_w * scale)
        dv_ref[pl.ds(off, band), :] = (
            dv_ref[pl.ds(off, band), :] + dv_w)


def _bwd_cols_kernel(off_ref, q_ref, k_ref, v_ref, g_ref, z_ref, rho_ref,
                     blocks_t_ref, dk_ref, dv_ref,
                     *, num_heads, hd, clamp, eps, scale, bf16):
    """Column-tile backward.  ``blocks_t_ref`` [T, band, tile] is the
    TRANSPOSED gate built in XLA (graph/banded.py row/col-swapped
    scatter) — a per-tile in-kernel transpose doubled this kernel's cost
    in the round-4 profile."""
    p = pl.program_id(0)
    tp, band, tile = blocks_t_ref.shape
    ones_t = _ones_bd(num_heads, tile)                    # [H*tile, H]
    for j in range(tp):
        t = p * tp + j
        off = pl.multiple_of(off_ref[t], 8)
        blk_t = blocks_t_ref[j].astype(jnp.float32)       # [band, tile]
        q_win = q_ref[pl.ds(off, band), :]                # rows i
        g_win = g_ref[pl.ds(off, band), :]
        zw = z_ref[pl.ds(off, band), :]                   # [band, H]
        rw = rho_ref[pl.ds(off, band), :]
        k_tbd = _bd(k_ref[pl.ds(t * tile, tile), :], num_heads, hd)
        v_tbd = _bd(v_ref[pl.ds(t * tile, tile), :], num_heads, hd)
        s_cat = _hdot(q_win, k_tbd, bf16) * scale               # [band, H*tile]
        G_cat = _hdot(g_win, v_tbd, bf16)
        e_cat = jnp.exp(jnp.clip(s_cat, -clamp, clamp))
        e_cat = e_cat * jnp.concatenate([blk_t] * num_heads, axis=1)
        invbig = _inv_big(zw, ones_t, eps)
        w_cat = e_cat * invbig
        rhobig = jax.lax.dot_general(
            rw, ones_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        inclip = ((s_cat >= -clamp) & (s_cat <= clamp)).astype(jnp.float32)
        dS_cat = e_cat * inclip * (G_cat - rhobig) * invbig
        # collapse [H*tile, H*hd] head-stacks: only block h of columns is
        # wanted per row block h — _cdot gives the stack, the head mask
        # zeroes the off-blocks, 8 slice-adds fold them
        dk_stack = _cdot(dS_cat, q_win, bf16) * scale     # [H*tile, H*hd]
        dv_stack = _cdot(w_cat, g_win, bf16)
        hm = _head_mask(num_heads, tile, hd)
        dk_stack = dk_stack * hm
        dv_stack = dv_stack * hm
        dk = dk_stack[0:tile, :]
        dv = dv_stack[0:tile, :]
        for h in range(1, num_heads):
            dk = dk + dk_stack[h * tile:(h + 1) * tile, :]
            dv = dv + dv_stack[h * tile:(h + 1) * tile, :]
        dk_ref[pl.ds(j * tile, tile), :] = dk
        dv_ref[pl.ds(j * tile, tile), :] = dv


def _run_fwd(blocks, col_off, qf, kf, vf, num_heads, hd, clamp, eps,
             bf16):
    n_tiles, tile, band = blocks.shape
    n, width = qf.shape
    scale = 1.0 / float(hd) ** 0.5
    tp = next(t for t in (_TILES_PER_PROGRAM, 2, 1) if n_tiles % t == 0)
    kern = functools.partial(_fwd_kernel, num_heads=num_heads, hd=hd,
                             clamp=clamp, eps=eps, scale=scale, bf16=bf16)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles // tp,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3 + [
            pl.BlockSpec((tp, tile, band), lambda p, c: (p, 0, 0))],
        out_specs=[
            pl.BlockSpec((tp * tile, width), lambda p, c: (p, 0)),
            pl.BlockSpec((tp * tile, num_heads), lambda p, c: (p, 0)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, width), jnp.float32),
                   jax.ShapeDtypeStruct((n, num_heads), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # the head-concatenated intermediates (s/e/w_cat [tile,
            # H*band], k/v_bd [H*band, width]) dominate scoped VMEM —
            # undercounting them OOM'd the f32-dot mode on chip
            vmem_limit_bytes=_vmem_limit(3 * n * width,
                                         tp * tile * band,
                                         6 * tile * num_heads * band,
                                         4 * num_heads * band * width,
                                         2 * tp * tile * width)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_tiles * tile * band * width,
            bytes_accessed=4 * (4 * n * width + blocks.size),
            transcendentals=n_tiles * tile * band * num_heads),
    )(col_off, qf, kf, vf, blocks)


def _run_bwd(blocks, col_off, qf, kf, vf, gf, z, num_heads, hd, clamp,
             eps, bf16, blocks_t=None):
    """Backward dispatch: single merged kernel by default;
    SCGIB_GT_BWD_TWOPASS=1 restores the round-4 row/column two-pass
    split (A/B and fallback)."""
    from ...utils.knobs import env_flag

    if not env_flag("SCGIB_GT_BWD_TWOPASS", "0"):
        return _run_bwd_merged(blocks, col_off, qf, kf, vf, gf, z,
                               num_heads, hd, clamp, eps, bf16)
    return _run_bwd_twopass(blocks, col_off, qf, kf, vf, gf, z,
                            num_heads, hd, clamp, eps, bf16,
                            blocks_t=blocks_t)


def _run_bwd_merged(blocks, col_off, qf, kf, vf, gf, z, num_heads, hd,
                    clamp, eps, bf16):
    n_tiles, tile, band = blocks.shape
    n, width = qf.shape
    scale = 1.0 / float(hd) ** 0.5
    tp = next(t for t in (_TILES_PER_PROGRAM, 2, 1) if n_tiles % t == 0)
    kern = functools.partial(_bwd_merged_kernel, num_heads=num_heads,
                             hd=hd, clamp=clamp, eps=eps, scale=scale,
                             bf16=bf16)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles // tp,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5 + [
            pl.BlockSpec((tp, tile, band), lambda p, c: (p, 0, 0))],
        out_specs=[
            pl.BlockSpec((tp * tile, width), lambda p, c: (p, 0)),
            # dk/dv: constant index map — the whole array stays VMEM-
            # resident across the (sequential) grid so programs can
            # read-modify-write their overlapping band windows; written
            # back to HBM once at the end
            pl.BlockSpec((n, width), lambda p, c: (0, 0)),
            pl.BlockSpec((n, width), lambda p, c: (0, 0)),
        ],
    )
    dq, dk, dv = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, width), jnp.float32),
                   jax.ShapeDtypeStruct((n, width), jnp.float32),
                   jax.ShapeDtypeStruct((n, width), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(8 * n * width,
                                         tp * tile * band,
                                         8 * tile * num_heads * band,
                                         4 * num_heads * band * width,
                                         2 * tp * tile * width)),
        cost_estimate=pl.CostEstimate(
            flops=6 * 2 * n_tiles * tile * band * width,
            bytes_accessed=4 * (8 * n * width + blocks.size),
            transcendentals=n_tiles * tile * band * num_heads),
    )(col_off, qf, kf, vf, gf, z, blocks)
    return dq, dk, dv


def _run_bwd_twopass(blocks, col_off, qf, kf, vf, gf, z, num_heads, hd,
                     clamp, eps, bf16, blocks_t=None):
    n_tiles, tile, band = blocks.shape
    n, width = qf.shape
    scale = 1.0 / float(hd) ** 0.5
    tp = next(t for t in (_TILES_PER_PROGRAM, 2, 1) if n_tiles % t == 0)

    kern1 = functools.partial(_bwd_rows_kernel, num_heads=num_heads,
                              hd=hd, clamp=clamp, eps=eps, scale=scale,
                              bf16=bf16)
    grid1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles // tp,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5 + [
            pl.BlockSpec((tp, tile, band), lambda p, c: (p, 0, 0))],
        out_specs=[
            pl.BlockSpec((tp * tile, width), lambda p, c: (p, 0)),
            pl.BlockSpec((tp * tile, num_heads), lambda p, c: (p, 0)),
        ],
    )
    dq, rho = pl.pallas_call(
        kern1,
        grid_spec=grid1,
        out_shape=[jax.ShapeDtypeStruct((n, width), jnp.float32),
                   jax.ShapeDtypeStruct((n, num_heads), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(5 * n * width,
                                         tp * tile * band,
                                         8 * tile * num_heads * band,
                                         4 * num_heads * band * width,
                                         2 * tp * tile * width)),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * n_tiles * tile * band * width,
            bytes_accessed=4 * (6 * n * width + blocks.size),
            transcendentals=n_tiles * tile * band * num_heads),
    )(col_off, qf, kf, vf, gf, z, blocks)

    # transposed gate, built in XLA (a per-tile in-kernel transpose
    # doubled the column kernel in the round-4 profile).  Callers that
    # run the attention under a layer scan pass ``blocks_t`` precomputed
    # (encoders.py builds it ONCE per encoder call) — otherwise a scanned
    # body would re-transpose per layer iteration.
    if blocks_t is None:
        blocks_t = jnp.swapaxes(blocks, 1, 2)
    kern2 = functools.partial(_bwd_cols_kernel, num_heads=num_heads,
                              hd=hd, clamp=clamp, eps=eps, scale=scale,
                              bf16=bf16)
    grid2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles // tp,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6 + [
            pl.BlockSpec((tp, band, tile), lambda p, c: (p, 0, 0))],
        out_specs=[
            pl.BlockSpec((tp * tile, width), lambda p, c: (p, 0)),
            pl.BlockSpec((tp * tile, width), lambda p, c: (p, 0)),
        ],
    )
    dk, dv = pl.pallas_call(
        kern2,
        grid_spec=grid2,
        out_shape=[jax.ShapeDtypeStruct((n, width), jnp.float32),
                   jax.ShapeDtypeStruct((n, width), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(6 * n * width,
                                         tp * tile * band,
                                         8 * tile * num_heads * band,
                                         4 * num_heads * band * width,
                                         2 * tp * tile * width)),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * n_tiles * tile * band * width,
            bytes_accessed=4 * (8 * n * width + blocks.size),
            transcendentals=n_tiles * tile * band * num_heads),
    )(col_off, qf, kf, vf, gf, z, rho, blocks_t)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def gt_flash_attention(blocks, col_off, q, k, v, clamp=5.0, eps=1e-6,
                       bf16_dots=None, blocks_t=None):
    """Graph-transformer banded attention, flash-style.  q/k/v [N, H, hd]
    -> [N, H, hd].  Same semantics as
    ``spmm_banded.gt_banded_attention`` (the XLA reference) without HBM
    score materialization.  ``bf16_dots`` (static): None = env default
    (_bf16_default).  ``blocks_t`` (optional, [T, band, tile]): the
    transposed gate for the backward column pass; pass it precomputed
    when calling under a layer scan so it is built once per step instead
    of once per layer iteration."""
    out, _ = _flash_fwd_impl(blocks, col_off, q, k, v, clamp, eps,
                             bf16_dots)
    return out


def _flash_fwd_impl(blocks, col_off, q, k, v, clamp, eps, bf16_dots):
    bf16 = _bf16_default() if bf16_dots is None else bool(bf16_dots)
    n, num_heads, hd = q.shape
    qf = q.reshape(n, num_heads * hd).astype(jnp.float32)
    kf = k.reshape(n, num_heads * hd).astype(jnp.float32)
    vf = v.reshape(n, num_heads * hd).astype(jnp.float32)
    outf, z = _run_fwd(blocks, col_off, qf, kf, vf, num_heads, hd,
                       clamp, eps, bf16)
    return outf.reshape(n, num_heads, hd).astype(q.dtype), z


def _flash_fwd(blocks, col_off, q, k, v, clamp, eps, bf16_dots,
               blocks_t=None):
    out, z = _flash_fwd_impl(blocks, col_off, q, k, v, clamp, eps,
                             bf16_dots)
    return out, (blocks, col_off, q, k, v, z, blocks_t)


def _flash_bwd(clamp, eps, bf16_dots, res, g):
    bf16 = _bf16_default() if bf16_dots is None else bool(bf16_dots)
    blocks, col_off, q, k, v, z, blocks_t = res
    n, num_heads, hd = q.shape
    qf = q.reshape(n, num_heads * hd).astype(jnp.float32)
    kf = k.reshape(n, num_heads * hd).astype(jnp.float32)
    vf = v.reshape(n, num_heads * hd).astype(jnp.float32)
    gf = g.reshape(n, num_heads * hd).astype(jnp.float32)
    dq, dk, dv = _run_bwd(blocks, col_off, qf, kf, vf, gf, z,
                          num_heads, hd, clamp, eps, bf16,
                          blocks_t=blocks_t)
    shape = (n, num_heads, hd)
    return (None, None, dq.reshape(shape).astype(q.dtype),
            dk.reshape(shape).astype(k.dtype),
            dv.reshape(shape).astype(v.dtype), None)


gt_flash_attention.defvjp(_flash_fwd, _flash_bwd)
