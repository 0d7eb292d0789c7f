"""GNN encoders: GIN, GCN, GraphSAGE, GraphTransformer.

TPU-native re-designs of the reference encoders (same math, no DGL):

  * ``GIN``             — reference models.py:52-72.  4 conv layers (the
                          reference hardcodes ``num_layers=5`` and builds
                          ``num_layers-1`` convs regardless of the CLI flag),
                          each ``MLP(h_v + sum_{u->v} h_u)`` (GINConv with
                          eps=0) -> BatchNorm -> ReLU.
  * ``GCN``             — reference models.py:75-88.  3 GraphConv layers
                          (d -> 2h -> 2h -> h) with symmetric normalization,
                          ReLU between.
  * ``GraphSAGE``       — reference models.py:91-104, *including its bug*:
                          layer2 is applied twice and layer3 never (the
                          ``self.conv2(g, h)`` repeat at models.py:103);
                          ``faithful_bug=False`` applies conv3 instead.
  * ``GraphTransformer``— reference models.py:807-918.  Per-edge SDDMM
                          attention with exp(clamp(score/sqrt(d_h), -5, 5))
                          normalization (no max-shift — kept faithful),
                          O-projection, residual + LayerNorm, FFN with
                          dropout 0.5, residual + LayerNorm; ``num_layers+1``
                          layers total (the reference appends one extra).

All encoders operate on a padded edge list and zero out padding rows before
downstream segment reductions consume h: GIN/GCN/SAGE re-zero after every
conv (their BatchNorm mixes rows, so padding must stay clean), while the
GraphTransformer masks ONCE after the last layer — its ops are row-local or
adjacency-gated, so padding garbage cannot leak (see GraphTransformer).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.spmm import gather_sum, gather_mean, gcn_norm_sum, sddmm_dot
from ..utils.knobs import env_flag as _env_flag, env_knob as _env_knob
from ..ops.spmm_banded import banded_spmm
from ..ops.segment import segment_sum, segment_normalize_exp
from .layers import MaskedBatchNorm, MLP2


def _mask_rows(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return x
    return x * mask.astype(x.dtype)[:, None]


class GIN(nn.Module):
    """4-layer GIN stack (hardcoded depth, mirroring models.py:57-64).

    ``axis_name``: sync-BN over a data-parallel mesh axis (see
    MaskedBatchNorm) so sharded batches match single-device numerics.
    """

    hidden: int = 64
    num_convs: int = 4   # reference: num_layers(5) - 1
    axis_name: Optional[str] = None
    use_pallas: Optional[bool] = None   # None = auto (TPU + band present)
    # 'bfloat16' runs the fused conv's matmuls in bf16 with f32 MXU
    # accumulation (f32 output, f32 BatchNorm, f32 backward); None = f32,
    # or set SCGIB_COMPUTE_DTYPE=bfloat16 globally.  Measured on v5e-1 at
    # d=64: numerics within 0.06% but ~50x slower through current Mosaic
    # (bf16 relayouts dominate at these tiny dims) — keep f32 unless
    # profiling says otherwise at larger hidden sizes
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, h, senders, receivers, *, node_mask=None,
                 edge_mask=None, band=None, train: bool = True):
        import jax as _jax

        n = h.shape[0]
        h = _mask_rows(h, node_mask)
        fuse = self.use_pallas
        if fuse is None:
            # auto: fused Pallas on TPU when the band layout is present
            # (full-train-step measured fastest: 386M edges/s vs 320M
            # banded-XLA vs ~370M gather on v5e-1); SCGIB_USE_PALLAS=0
            # forces the XLA banded path.  Size gate (round 5, like the
            # pool kernel's 32 MB gate): at LRGB k=3 shapes (618-tile
            # grids, 20 MB node buffers) the full scanned step
            # reproducibly crashed the remote compile helper (HTTP 500,
            # same class as the round-3 SAGE-only crash) although the
            # kernel fwd+bwd compile clean standalone — beyond 8 MB the
            # XLA banded path runs instead (13.2 ms/step at that shape,
            # loss finite; bench_peptides.py record).
            import os as _os

            fuse = (band is not None
                    and _jax.default_backend() == "tpu"
                    and h.size * 4 <= (8 << 20)
                    and _env_flag("SCGIB_USE_PALLAS"))
        for i in range(self.num_convs):
            mlp = MLP2(self.hidden, self.hidden, name=f"conv{i}")
            if band is not None and fuse:
                # fused Pallas layer: banded MXU SpMM + both MLP matmuls
                # in one kernel (~12x the gather+segment path per layer
                # on v5e, bench_spmm.py); backward exploits A == A^T
                import os as _os

                from ..ops.pallas.banded import gin_banded_layer

                cdt = self.compute_dtype or _env_knob(
                    "SCGIB_COMPUTE_DTYPE")
                _ = mlp(h[:1])   # register params; DCE'd under jit
                p = mlp.variables["params"]
                args = (band[0], band[1], h,
                        p["Dense_0"]["kernel"], p["Dense_0"]["bias"],
                        p["Dense_1"]["kernel"], p["Dense_1"]["bias"])
                if cdt == "bfloat16":
                    bf = jnp.bfloat16
                    args = (args[0].astype(bf), args[1], args[2].astype(bf),
                            args[3].astype(bf), args[4],
                            args[5].astype(bf), args[6])
                h = gin_banded_layer(*args)
            else:
                if band is not None:
                    # banded block-dense MXU aggregation (XLA variant)
                    agg = banded_spmm(band[0], band[1], h)
                else:
                    agg = gather_sum(h, senders, receivers, n, edge_mask)
                # GINConv(learn_eps=False): (1+0)*h_v + neighbor sum
                h = mlp(h + agg)
            h = MaskedBatchNorm(name=f"bn{i}",
                                axis_name=self.axis_name)(h, node_mask,
                                                          train=train)
            h = nn.relu(h)
            h = _mask_rows(h, node_mask)
        return h


class GCN(nn.Module):
    """3-layer GraphConv stack d -> 2h -> 2h -> h (models.py:75-88)."""

    hidden: int = 64

    @nn.compact
    def __call__(self, h, senders, receivers, *, node_mask=None,
                 edge_mask=None, band=None, train: bool = True):
        n = h.shape[0]
        h = _mask_rows(h, node_mask)
        if band is not None:
            # D^-1/2 A D^-1/2 x as row scalings around the SYMMETRIC
            # unweighted banded SpMM (MXU path; ~6x the COO gather step
            # measured through the full pretrain step on v5e-1)
            from ..ops.pallas.banded import spmm_banded_fast
            from ..ops.segment import segment_count
            from ..ops.spmm import jax_rsqrt
            import jax.numpy as _jnp

            out_deg = segment_count(senders, n, mask=edge_mask)
            in_deg = segment_count(receivers, n, mask=edge_mask)
            src_norm = _jnp.where(out_deg > 0, jax_rsqrt(out_deg), 0.0)
            dst_norm = _jnp.where(in_deg > 0, jax_rsqrt(in_deg), 0.0)

            def _agg(x):
                return spmm_banded_fast(
                    band[0], band[1], x * src_norm[:, None]
                ) * dst_norm[:, None]
        else:
            def _agg(x):
                return gcn_norm_sum(x, senders, receivers, n, edge_mask)
        dims = (self.hidden * 2, self.hidden * 2, self.hidden)
        for i, d in enumerate(dims):
            agg = _agg(h)
            h = nn.Dense(d, name=f"conv{i}")(agg)
            if i < 2:
                h = nn.relu(h)
            h = _mask_rows(h, node_mask)
        return h


class GraphSAGE(nn.Module):
    """3 mean-aggregation SAGE convs (models.py:91-104).

    ``faithful_bug=True`` (default) replicates the reference's repeated
    conv2 / unused conv3: the third round re-applies layer 2's weights.
    """

    hidden: int = 64
    faithful_bug: bool = True

    @nn.compact
    def __call__(self, h, senders, receivers, *, node_mask=None,
                 edge_mask=None, band=None, train: bool = True):
        n = h.shape[0]
        h = _mask_rows(h, node_mask)

        fc_self = [nn.Dense(self.hidden, name=f"self{i}") for i in range(3)]
        fc_neigh = [nn.Dense(self.hidden, use_bias=False,
                             name=f"neigh{i}") for i in range(3)]

        if band is not None:
            # mean agg = (A x) / deg: symmetric banded SpMM + row scale,
            # through the Pallas kernel by default.  History: this exact
            # composition reproducibly crashed the ROUND-3 remote TPU
            # compiler (HTTP 500) while GCN with the same kernel compiled
            # fine; the round-4 toolchain compiles and runs it (1337 vs
            # 1713 us/step).  SCGIB_SAGE_PALLAS=0 restores the XLA
            # fallback should the compiler regress; numerics between the
            # two paths are pinned by tests/test_sage_pallas.py.
            import os as _os

            import jax.numpy as _jnp

            from ..ops.segment import segment_count

            if _env_flag("SCGIB_SAGE_PALLAS"):
                from ..ops.pallas.banded import spmm_banded_fast as _spmm
            else:
                from ..ops.spmm_banded import banded_spmm as _spmm

            deg = segment_count(receivers, n, mask=edge_mask)
            inv_deg = 1.0 / _jnp.maximum(deg, 1.0)

            def _mean(x):
                return _spmm(band[0], band[1], x) * inv_deg[:, None]
        else:
            def _mean(x):
                return gather_mean(x, senders, receivers, n, edge_mask)

        def conv(i, x):
            neigh = _mean(x)
            return fc_self[i](x) + fc_neigh[i](neigh)

        h = nn.relu(conv(0, h))
        h = _mask_rows(h, node_mask)
        h = nn.relu(conv(1, h))
        h = _mask_rows(h, node_mask)
        h = conv(1 if self.faithful_bug else 2, h)
        return _mask_rows(h, node_mask)


class GraphTransformerLayer(nn.Module):
    """One graph-transformer layer (models.py:832-871).

    ``dtype``: activation/compute dtype for the dense tail (Q/K/V, O,
    FFN, LayerNorm I/O — flax LayerNorm still computes its statistics in
    f32 internally).  bf16 halves the traffic of the LN/residual
    fusions, but measured on v5e-1 it LOSES net (see the knob note in
    GraphTransformer — the f32 casts at the flash-kernel boundaries cost
    more), so the default stays f32.  Params stay f32 either way
    (param_dtype default)."""

    hidden: int
    num_heads: int
    dropout: float = 0.5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, h, senders, receivers, *, node_mask=None,
                 edge_mask=None, band=None, train: bool = True):
        n = h.shape[0]
        hd = self.hidden // self.num_heads

        # Q/K/V as ONE [d, 3d] matmul AND one stored parameter: the step
        # is op-count-bound (PERF.md), so 3 projection dispatches/layer
        # (x10 layers x fwd+bwd) collapse to 1; storing the parameter
        # fused (rather than concatenating Q/K/V kernels per step, the
        # round-5 interim form) also removes the per-step param concats
        # and cuts the optimizer leaf count (the flattened-Adam concat
        # copies every leaf buffer — 149 us/step at 175 leaves in the
        # round-5 GT trace).  Same init distribution as three Dense(h)
        # (lecun fan-in is the input dim either way); per-element
        # reductions are bit-identical.  SCGIB_GT_FUSED_QKV=0 restores
        # separate Q/K/V Dense params (A/B + per-projection freeze
        # masks); the test oracles read either layout.
        dt = self.dtype
        if _env_flag("SCGIB_GT_FUSED_QKV"):
            qkv = nn.Dense(3 * self.hidden, name="qkv", dtype=dt)(h)
            q = qkv[:, :self.hidden].reshape(n, self.num_heads, hd)
            k = qkv[:, self.hidden:2 * self.hidden].reshape(
                n, self.num_heads, hd)
            v = qkv[:, 2 * self.hidden:].reshape(n, self.num_heads, hd)
        else:
            q = nn.Dense(self.hidden, name="Q", dtype=dt)(h).reshape(
                n, self.num_heads, hd)
            k = nn.Dense(self.hidden, name="K", dtype=dt)(h).reshape(
                n, self.num_heads, hd)
            v = nn.Dense(self.hidden, name="V", dtype=dt)(h).reshape(
                n, self.num_heads, hd)

        if band is not None:
            import jax as _jax
            import os as _os

            if (_jax.default_backend() == "tpu"
                    and _env_flag("SCGIB_GT_FLASH")):
                # flash-style Pallas kernels: scores never leave VMEM
                # (the XLA banded form materialized [T, H, tile, band]
                # tensors in HBM — 43.8 ms/step at bench shapes,
                # round-3 verdict item 2)
                from ..ops.pallas.gt_flash import gt_flash_attention

                # band may carry the precomputed transposed gate as a
                # third element (built once per encoder call so a layer
                # scan does not re-transpose it per iteration)
                attn = gt_flash_attention(
                    band[0], band[1], q, k, v,
                    blocks_t=band[2] if len(band) > 2 else None)
            else:
                # banded MXU path: dense per-tile window attention
                # (ops/spmm_banded.py::gt_banded_attention, parity-tested
                # against the COO composition below)
                from ..ops.spmm_banded import gt_banded_attention

                attn = gt_banded_attention(band[0], band[1], q, k, v)
        else:
            # COO path: SDDMM edge scores then the reference's clamp+exp
            # normalization
            score = sddmm_dot(k, q, senders, receivers) / jnp.sqrt(float(hd))
            w = segment_normalize_exp(score, receivers, n, mask=edge_mask)

            msg = jnp.take(v, senders, axis=0) * w[:, :, None]
            attn = segment_sum(msg, receivers, n, mask=edge_mask)
        attn = attn.reshape(n, self.hidden)

        out = nn.Dense(self.hidden, name="O", dtype=dt)(
            attn.astype(dt) if dt is not None else attn)
        h = h + out
        h = nn.LayerNorm(name="ln1", dtype=dt)(h)
        h2 = nn.Dense(self.hidden * 2, name="ffn1", dtype=dt)(h)
        h2 = nn.relu(h2)
        h2 = nn.Dropout(self.dropout, deterministic=not train)(h2)
        h2 = nn.Dense(self.hidden, name="ffn2", dtype=dt)(h2)
        h = nn.LayerNorm(name="ln2", dtype=dt)(h + h2)
        # NOTE: padding rows are NOT re-zeroed here — every op above is
        # row-local or adjacency-gated, so their garbage cannot reach real
        # rows; GraphTransformer masks once after the last layer.
        return h


class _GTScanBody(nn.Module):
    """nn.scan body for the transformer stack: carry = node features,
    broadcast inputs = (senders, receivers, node_mask, edge_mask, band).
    ``train`` is a static attribute (it selects dropout determinism at
    trace time)."""

    hidden: int
    num_heads: int
    train: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, h, inv):
        senders, receivers, node_mask, edge_mask, band = inv
        h = GraphTransformerLayer(
            self.hidden, self.num_heads, name="layer", dtype=self.dtype)(
                h, senders, receivers, node_mask=node_mask,
                edge_mask=edge_mask, band=band, train=self.train)
        return h, None


class GraphTransformer(nn.Module):
    """Embedding + (num_layers + 1) transformer layers (models.py:807-829)."""

    hidden: int = 64
    num_layers: int = 4
    num_heads: int = 8

    @nn.compact
    def __call__(self, h, senders, receivers, *, node_mask=None,
                 edge_mask=None, band=None, train: bool = True,
                 gt_fits: bool = False):
        import os as _os

        import jax as _jax

        if (band is not None and gt_fits
                and _jax.default_backend() == "tpu"
                and _env_flag("SCGIB_GT_FLASH")):
            # narrower attention-specific banded geometry (tile=64,
            # band=128): the flash kernels are VPU-bound on the dense
            # window, so halving the band halves their work.  gt_fits is
            # the packer's static proof that every graph/ego-net fits
            # (graph/banded.py).  Built once here; the blocks depend only
            # on the batch's index arrays, so XLA hoists the scatter out
            # of scanned training steps and CSEs it across layers.
            from ..graph.banded import (GT_ALIGN, GT_BAND, GT_TILE,
                                        banded_col_off, build_blocks_jax)

            n = h.shape[0]
            off = jnp.asarray(banded_col_off(n, GT_TILE, GT_BAND,
                                             GT_ALIGN))
            blocks = build_blocks_jax(senders, receivers, edge_mask, off,
                                      n, tile=GT_TILE, band=GT_BAND)
            band = (blocks, off)
        if (band is not None and _jax.default_backend() == "tpu"
                and _env_flag("SCGIB_GT_FLASH")):
            # precompute the backward column pass's transposed gate ONCE
            # per encoder call — under the layer scan below the per-layer
            # bodies would otherwise each rebuild it (the loop version
            # relied on XLA CSE across unrolled layers)
            band = (band[0], band[1], jnp.swapaxes(band[0], 1, 2))
        # Activation dtype for the layer stack's dense tail (see
        # GraphTransformerLayer.dtype).  SCGIB_GT_ACT_BF16=1 runs the
        # dense tail in bf16 — measured a net LOSS on v5e-1 (3238 vs
        # 3179 us/step): the f32 casts at the flash-kernel boundaries
        # (q/k/v/g are f32 kernel inputs) cost more than the halved
        # traffic of the LN/residual fusions saves.  Default f32.
        dt = (jnp.bfloat16
              if (_jax.default_backend() == "tpu"
                  and _env_flag("SCGIB_GT_ACT_BF16", "0"))
              else None)
        h = nn.Dense(self.hidden, use_bias=False, name="embed",
                     dtype=dt)(h)
        h = _mask_rows(h, node_mask)
        n_layers = self.num_layers + 1
        if _env_flag("SCGIB_GT_SCAN", "0"):
            # OPTIONAL nn.scan over the structurally identical layers
            # (stacked [L, ...] params, tree layers/layer/...).  Measured
            # on v5e-1 this is a net LOSS for the 5-layer d=64 stack
            # (3670 vs 3294 us/step): the per-iteration dynamic-slicing
            # of small stacked params and the lost cross-layer fusion
            # cost more than the saved dispatch, so the unrolled loop
            # stays the default.  Kept because at deeper/wider stacks the
            # tradeoff flips (compile time and HLO size scale with the
            # unrolled layer count).
            body = nn.scan(
                _GTScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=n_layers,
                in_axes=nn.broadcast,
                out_axes=0,
            )(self.hidden, self.num_heads, train=train, dtype=dt,
              name="layers")
            h, _ = body(h, (senders, receivers, node_mask, edge_mask,
                            band))
        else:
            for i in range(n_layers):
                h = GraphTransformerLayer(
                    self.hidden, self.num_heads, name=f"layer{i}",
                    dtype=dt)(
                        h, senders, receivers, node_mask=node_mask,
                        edge_mask=edge_mask, band=band, train=train)
        h = h.astype(jnp.float32)   # downstream readouts/losses are f32
        # Padding rows are masked ONCE here, not per layer: every op in a
        # transformer layer is row-local (LayerNorm/FFN) or gates padding
        # out via the adjacency (attention: a padding row's band window is
        # all-zero so its z=0 and its weights are exactly 0), so garbage
        # in padding rows never leaks into real rows or into weight
        # gradients (padding rows carry zero upstream gradient).  The
        # per-layer masking cost ~10 masked [N, d] multiplies per train
        # step (fwd + bwd) at bench shapes.
        return _mask_rows(h, node_mask)


def gt_layer_params(params, i: int):
    """Per-layer param subtree of a ``GraphTransformer``, independent of
    layout: the scanned default stacks layers as ``layers/layer/...``
    with a leading layer axis, the unrolled fallback (SCGIB_GT_SCAN=0)
    names them ``layer{i}``."""
    import jax as _jax

    if "layers" in params:
        return _jax.tree_util.tree_map(lambda a: a[i],
                                       params["layers"]["layer"])
    return params[f"layer{i}"]


ENCODERS = {
    "GIN": GIN,
    "GCN": GCN,
    "GraphSAGE": GraphSAGE,
    "Transformer": GraphTransformer,
}


def make_encoder(name: str, hidden: int, num_layers: int = 4,
                 num_heads: int = 8, module_name: Optional[str] = None,
                 axis_name: Optional[str] = None):
    if name == "GIN":
        # num_layers = conv count.  The released reference class builds 4
        # convs (models.py:57-64), but the shipped pretrained artifact has
        # 5 (ginlayers.0-4) — the authors' training-time code differed.
        return GIN(hidden=hidden, num_convs=num_layers, name=module_name,
                   axis_name=axis_name)
    if name == "GCN":
        return GCN(hidden=hidden, name=module_name)
    if name == "GraphSAGE":
        return GraphSAGE(hidden=hidden, name=module_name)
    if name == "Transformer":
        return GraphTransformer(hidden=hidden, num_layers=num_layers,
                                num_heads=num_heads, name=module_name)
    raise ValueError(f"unknown encoder '{name}' "
                     "(expected GIN | GCN | GraphSAGE | Transformer)")


class DenseGIN(nn.Module):
    """GIN over dense-block ego-nets ([C, S, d] features + [C, S, S]
    adjacency): the aggregation is one batched einsum instead of gather +
    segment-sum.

    Parameter structure is IDENTICAL to ``GIN`` (conv{i}: MLP2, bn{i}:
    MaskedBatchNorm), so the same variables drive both paths and outputs
    match the COO encoder up to reduction order
    (tests/test_dense_subgraphs.py).

    Measured on v5e-1 (bench.py BENCH_SUBGRAPH_MODE): the dense path is
    ~3x SLOWER than the sorted-COO segment path for molecular k=1
    ego-nets — padding every center to S rows multiplies the conv-MLP and
    BatchNorm row count by ~2.7x, which outweighs the saved scatter.  It
    is kept as a tested alternative (it wins when ego-net sizes are
    near-uniform and S is tight) but 'coo' is the default."""

    hidden: int = 64
    num_convs: int = 4
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, h, adj, *, mask=None, train: bool = True):
        c, s, _ = h.shape
        flat_mask = mask.reshape(c * s) if mask is not None else None
        if mask is not None:
            h = h * mask.astype(h.dtype)[:, :, None]
        for i in range(self.num_convs):
            agg = jnp.einsum("cij,cjd->cid", adj, h,
                             preferred_element_type=h.dtype)
            z = (h + agg).reshape(c * s, -1)
            z = MLP2(self.hidden, self.hidden, name=f"conv{i}")(z)
            z = MaskedBatchNorm(name=f"bn{i}",
                                axis_name=self.axis_name)(z, flat_mask,
                                                          train=train)
            z = nn.relu(z)
            h = z.reshape(c, s, self.hidden)
            if mask is not None:
                h = h * mask.astype(h.dtype)[:, :, None]
        return h
