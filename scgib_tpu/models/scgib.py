"""The S-CGIB model family — TPU-native, fully vectorized.

Re-designs of the reference's model classes (models.py):

  * ``SCGIBCore``        — the shared ``extract_features`` machinery of
                           ``Mainmodel`` (models.py:595-660, 702-750): twin
                           encoders, concrete-relaxation compression gate,
                           per-graph noise injection, core<->candidate
                           attention.  The reference's two per-graph Python
                           loops (models.py:631-660, 728-750) become masked
                           segment ops over the whole padded batch.
  * ``PretrainModel``    — ``Mainmodel`` / ``Mainmodel_continue``
                           (models.py:546-700, 1010-1195): per-stage input
                           projection + MLP head + the three losses
                           (KL + InfoNCE + reconstruction).
  * ``FinetuneModel``    — ``Mainmodel_finetuning`` (models.py:358-543):
                           fresh projection/MLP/Set2Set/predict around the
                           pretrained core; sigmoid unless the dataset is a
                           regression task.
  * ``DomainAdaptModel`` — ``Mainmodel_domainadapt`` (models.py:107-355):
                           Set2Set feature-reconstruction loss against the
                           raw input features.

RNG: the compression gate consumes two uniform draws per call via the
``'noise'`` RNG stream (reference torch.rand at models.py:599, 650).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..graph.container import (DenseSubgraphBatch, GraphBatch,
                               SubgraphBatch)
from ..ops.segment import (segment_broadcast, segment_softmax,
                           segment_std_mean, segment_sum)
from .encoders import make_encoder
from .layers import MLP2, SegmentBatchNorm
from .losses import (contrastive_infonce, kl_loss, l2_normalize, mae_loss,
                     recon_adj_loss, recon_logm_loss, rmse_loss)
from .set2set import Set2Set


def _resolve_band(batch):
    """Banded adjacency for a Graph/SubgraphBatch, or None.

    Host-packed blocks are used as-is.  When the packer shipped only
    ``band_col_off`` (``banded='device'``), the [T, tile, band] blocks are
    scattered together here, on device under jit — the COO upload is ~100
    KB where the block upload is ~20 MB per batch."""
    blocks = getattr(batch, "band_blocks", None)
    col_off = getattr(batch, "band_col_off", None)
    if col_off is None:
        return None
    if blocks is None:
        from ..graph.banded import build_blocks_jax

        n = batch.node_mask.shape[0]
        blocks = build_blocks_jax(batch.senders, batch.receivers,
                                  batch.edge_mask, col_off, n)
    return blocks, col_off


def _sub_features(g, sub):
    """Sub-node features: shipped copies, or the on-device gather
    ``g.node_feat[node_orig]`` when the packer left ``node_feat=None``
    (the default wire format — see pack_subgraphs)."""
    if sub.node_feat is not None:
        return sub.node_feat
    return jnp.take(g.node_feat, sub.node_orig, axis=0)


def _project_inputs(transfer_d, g, sub, normalize: bool):
    """(x_proj, x_sub_proj) for the twin encoders: one concatenated
    [N+S, F] projection instead of two — the [N, F] and [S, F] matmuls
    are overhead-bound at F=9 (~70 us/step combined fwd+bwd, round 4).
    (subgraph_mode='dense' ships 3-D sub features — projected
    separately.)

    Round-5 note: projection and row-wise l2-normalize commute with the
    sub-node gather, so ``x_sub_proj == x_proj[node_orig]`` exactly on
    the wire path — but the project-then-gather form MEASURED SLOWER
    (854 vs 751-794 us/step): the [S, d=32] gather fwd + scatter-add bwd
    outweigh the saved concat, because the old path's gather/scatter run
    at the raw F=9 width.  Keep the concat."""
    x = l2_normalize(g.node_feat) if normalize else g.node_feat
    x_sub_raw = _sub_features(g, sub)
    x_sub = l2_normalize(x_sub_raw) if normalize else x_sub_raw
    if x_sub.ndim == x.ndim:
        proj = transfer_d(jnp.concatenate([x, x_sub], axis=0))
        return proj[:x.shape[0]], proj[x.shape[0]:]
    return transfer_d(x), transfer_d(x_sub)


class CoreFeatures(NamedTuple):
    """Outputs of ``SCGIBCore.extract_features`` (models.py:750 return)."""

    interaction_map: jnp.ndarray   # [N, 2d]
    kl_node: jnp.ndarray           # [N, d] per-node KL matrix
    noisy: jnp.ndarray             # [N, d] noise-gated node features
    clean_readout: jnp.ndarray     # [G, d] (or [G, 2d] for s2s readout)


class Compressor(nn.Module):
    """d -> d -> BatchNorm -> ReLU -> 1 gate scorer (models.py:589-593).

    The BatchNorm is *per graph* in train mode because the reference invokes
    the compressor inside its per-graph loop (models.py:642) — see
    ``SegmentBatchNorm``.
    """

    hidden: int

    @nn.compact
    def __call__(self, h, segment_ids, num_segments, mask=None,
                 train: bool = True):
        x = nn.Dense(self.hidden, name="fc1")(h)
        x = SegmentBatchNorm(name="bn")(x, segment_ids, num_segments,
                                        mask=mask, train=train)
        x = nn.relu(x)
        return nn.Dense(1, name="fc2")(x)


class SCGIBCore(nn.Module):
    """Twin encoders + compression + core<->candidate attention."""

    hidden: int = 64
    encoder: str = "GIN"
    num_layers: int = 4
    num_heads: int = 8
    readout: str = "sum"        # 'sum' | 's2s' (reference --readout_f)
    use_att: bool = True
    gate_bias: float = 1e-4     # reference's `bias` at models.py:598
    std_eps: float = 1e-7       # reference's `epsilon` at models.py:632
    deterministic: bool = False  # True: gate=sigmoid(p), no feature noise
                                 # (for golden/parity tests; reference has no
                                 # such mode — its noise is always on)
    axis_name: Optional[str] = None  # sync-BN across the DP mesh axis
    subgraph_mode: str = "coo"   # 'coo' (SubgraphBatch segment ops) |
                                 # 'dense' (DenseSubgraphBatch batched
                                 # einsum — MXU path, GIN only; parameter
                                 # trees are identical between the two)

    def setup(self):
        from .encoders import DenseGIN

        self.encoder1 = make_encoder(self.encoder, self.hidden,
                                     self.num_layers, self.num_heads,
                                     module_name="encoder1",
                                     axis_name=self.axis_name)
        if self.subgraph_mode == "dense":
            if self.encoder != "GIN":
                raise ValueError("subgraph_mode='dense' supports GIN only")
            self.encoder2 = DenseGIN(hidden=self.hidden,
                                     num_convs=self.num_layers,
                                     axis_name=self.axis_name,
                                     name="encoder2")
        else:
            self.encoder2 = make_encoder(self.encoder, self.hidden,
                                         self.num_layers, self.num_heads,
                                         module_name="encoder2",
                                         axis_name=self.axis_name)
        self.compressor = Compressor(self.hidden, name="compressor")
        self.attn_layer = nn.Dense(1, name="attn_layer")
        if self.readout == "s2s":
            self.s2s = Set2Set(self.hidden, name="s2s")
            self.reduce_d = nn.Dense(self.hidden, name="reduce_d")

    def _graph_readout(self, h, g: GraphBatch):
        if self.readout == "sum":
            return segment_sum(h, g.node_graph, g.num_graphs,
                               mask=g.node_mask)
        return self.s2s(h, g.node_graph, g.num_graphs, mask=g.node_mask)

    def compress(self, h, g: GraphBatch, train: bool):
        """Concrete-relaxation gate lambda in (0,1) per node
        (models.py:595-604): sigmoid(logit(eps) + p), eps ~ U(bias, 1-bias).
        """
        p = self.compressor(h, g.node_graph, g.num_graphs,
                            mask=g.node_mask, train=train)      # [N, 1]
        if self.deterministic:
            return jax.nn.sigmoid(p), p
        key = self.make_rng("noise")
        eps = jax.random.uniform(key, p.shape, p.dtype,
                                 minval=self.gate_bias,
                                 maxval=1.0 - self.gate_bias)
        gate = jax.nn.sigmoid(jnp.log(eps) - jnp.log1p(-eps) + p)
        return gate, p

    def compression(self, h, g: GraphBatch, train: bool):
        """Vectorized form of the reference's per-graph loop
        (models.py:631-660): noise-gated features + per-node KL matrix.
        """
        lam, _p = self.compress(h, g, train)                    # [N, 1]
        lam_neg = 1.0 - lam

        h_static = jax.lax.stop_gradient(h)
        std_g, mean_g = segment_std_mean(h_static, g.node_graph,
                                         g.num_graphs, mask=g.node_mask)
        mean_n = segment_broadcast(mean_g, g.node_graph,
                                   g.num_graphs)                 # [N, d]
        std_n = segment_broadcast(std_g, g.node_graph, g.num_graphs)

        noisy_mean = lam * h + lam_neg * mean_n
        noisy_std = lam_neg * std_n
        if self.deterministic:
            noisy = noisy_mean
        else:
            key = self.make_rng("noise")
            u = jax.random.uniform(key, noisy_mean.shape, noisy_mean.dtype)
            noisy = noisy_mean + u * noisy_std
        noisy = noisy * g.node_mask.astype(noisy.dtype)[:, None]

        # KL: 0.5 * sigma_n^2 / sigma_g^2  +  sum_{v in g}((mu_v-mu_g)/sigma_g)^2
        denom = std_n + self.std_eps
        term1 = 0.5 * (noisy_std ** 2) / (denom ** 2)
        dev = (noisy_mean - mean_n) / denom
        term2_g = segment_sum(dev * dev, g.node_graph, g.num_graphs,
                              mask=g.node_mask)                  # [G, d]
        kl_node = term1 + segment_broadcast(term2_g, g.node_graph,
                                            g.num_graphs)
        kl_node = kl_node * g.node_mask.astype(kl_node.dtype)[:, None]
        return noisy, kl_node

    def extract_features(self, g: GraphBatch, sub: SubgraphBatch,
                         x_proj: jnp.ndarray, x_sub_proj: jnp.ndarray,
                         train: bool = True) -> CoreFeatures:
        # 1-2. twin encoders over the graph batch and the flattened ego-nets
        enc_kw = {}
        sub_kw = {}
        if self.encoder in ("GIN", "GCN", "GraphSAGE", "Transformer"):
            band = _resolve_band(g)
            if band is not None:
                enc_kw["band"] = band
            sub_band = _resolve_band(sub)
            if sub_band is not None:
                sub_kw["band"] = sub_band
        if self.encoder == "Transformer":
            # static flag: lets the flash kernels pick the narrower
            # (64, 128) banded geometry (graph/banded.py GT notes)
            enc_kw["gt_fits"] = g.gt_fits
            sub_kw["gt_fits"] = getattr(sub, "gt_fits", False)
        h = self.encoder1(x_proj, g.senders, g.receivers,
                          node_mask=g.node_mask, edge_mask=g.edge_mask,
                          train=train, **enc_kw)
        if self.subgraph_mode == "dense":
            h_sub = self.encoder2(x_sub_proj, sub.adj, mask=sub.mask,
                                  train=train)                   # [C, S, d]
        else:
            h_sub = self.encoder2(x_sub_proj, sub.senders, sub.receivers,
                                  node_mask=sub.node_mask,
                                  edge_mask=sub.edge_mask, train=train,
                                  **sub_kw)

        # 3. clean per-graph readout (models.py:714-718)
        clean_readout = self._graph_readout(h, g)

        # 4. compression gate + noise (models.py:631-660)
        noisy, kl_node = self.compression(h, g, train)

        # 5. candidate embedding per center node: sum over its ego-net
        #    (models.py:724-725)
        if self.subgraph_mode == "dense":
            cand = jnp.sum(h_sub * sub.mask.astype(h_sub.dtype)[:, :, None],
                           axis=1)                               # [N, d]
        else:
            # sorted-banded pooling: MXU matmul fwd + gather bwd instead
            # of an XLA scatter-add (~140 us/step at bench shapes)
            from ..ops.pool import sorted_segment_sum_banded

            cand = sorted_segment_sum_banded(h_sub, sub.node_center,
                                             g.num_nodes,
                                             mask=sub.node_mask)  # [N, d]

        if not self.use_att:
            im = jnp.concatenate([noisy, cand], axis=-1)
            return CoreFeatures(im, kl_node, noisy, clean_readout)

        # 6. core<->candidate attention, per graph over nodes
        #    (models.py:728-750), segment-softmax instead of the loop
        if self.readout == "sum":
            noisy_readout = segment_sum(noisy, g.node_graph, g.num_graphs,
                                        mask=g.node_mask)
        else:
            noisy_readout = self.reduce_d(
                self.s2s(noisy, g.node_graph, g.num_graphs,
                         mask=g.node_mask))
        inter = jnp.concatenate(
            [segment_broadcast(noisy_readout, g.node_graph, g.num_graphs),
             cand], axis=-1)                                     # [N, 2d]
        att = self.attn_layer(inter)[:, 0]
        alpha = segment_softmax(att, g.node_graph, g.num_graphs,
                                mask=g.node_mask)
        cand_att = cand * alpha[:, None]
        im = jnp.concatenate([noisy, cand_att], axis=-1)
        im = im * g.node_mask.astype(im.dtype)[:, None]
        return CoreFeatures(im, kl_node, noisy, clean_readout)

    def __call__(self, g: GraphBatch, sub: SubgraphBatch,
                 x_proj: jnp.ndarray, x_sub_proj: jnp.ndarray,
                 train: bool = True) -> CoreFeatures:
        return self.extract_features(g, sub, x_proj, x_sub_proj, train)


class PretrainLosses(NamedTuple):
    kl: jnp.ndarray
    contrastive: jnp.ndarray
    reconstruction: jnp.ndarray

    @property
    def total(self) -> jnp.ndarray:
        # unit weights, matching exp_pretraining.py:321 / paper Eq.19 beta=1
        return self.kl + self.contrastive + self.reconstruction


class PretrainModel(nn.Module):
    """``Mainmodel``/``Mainmodel_continue`` — projection + core + losses.

    ``kl_mode='reference'`` replicates the last-graph-only KL accumulation
    bug (models.py:659); 'corrected' (default) averages over all graphs.
    ``recons_type``: 'adj' (default, exp_pretraining.py:393) or 'logM'.
    """

    in_dim: int
    hidden: int = 64
    d_transfer: int = 32
    encoder: str = "GIN"
    num_layers: int = 4
    num_heads: int = 8
    readout: str = "sum"
    use_att: bool = True
    recons_type: str = "adj"
    recons_impl: str = "gram"   # 'gram' O(N d^2) | 'dense' literal N x N
    kl_mode: str = "corrected"
    k_transition: int = 1
    deterministic: bool = False
    normalize_input: bool = True      # row-wise F.normalize on features, as
                                      # every reference train loop does
                                      # before forward (exp_pretraining.py:
                                      # 312-314, train_moleculenetBACE.py:
                                      # 150-152)
    subgraph_mode: str = "coo"        # see SCGIBCore.subgraph_mode
    axis_name: Optional[str] = None   # data-parallel mesh axis: contrastive
                                      # denominator + loss normalizers span
                                      # the global batch (SURVEY.md §7.3)

    def setup(self):
        if self.kl_mode == "reference" and self.axis_name is not None:
            # under DP each shard would pick its own "last graph"
            # (losses.kl_loss note) — bit-parity mode and data parallelism
            # are mutually exclusive.  The node-sharded path
            # (parallel/sharded_scgib.py) DOES support 'reference' exactly.
            raise ValueError(
                "kl_mode='reference' is not data-parallel safe: the "
                "last-graph bug (models.py:659) has no per-shard analog. "
                "Use kl_mode='corrected' with axis_name, or the "
                "node-sharded ShardedPretrainModel which reproduces "
                "'reference' exactly.")
        self.transfer_d = nn.Dense(self.d_transfer, use_bias=False,
                                   name="transfer_d")
        self.core = SCGIBCore(hidden=self.hidden, encoder=self.encoder,
                              num_layers=self.num_layers,
                              num_heads=self.num_heads, readout=self.readout,
                              use_att=self.use_att,
                              deterministic=self.deterministic,
                              axis_name=self.axis_name,
                              subgraph_mode=self.subgraph_mode,
                              name="core")
        self.head_mlp = MLP2(self.hidden, self.hidden, name="head_mlp")
        if self.readout == "s2s":
            self.s2s = Set2Set(self.hidden, name="s2s")

    def __call__(self, g: GraphBatch, sub: SubgraphBatch,
                 logm_targets: Optional[jnp.ndarray] = None,
                 logm_weights: Optional[jnp.ndarray] = None,
                 train: bool = True) -> PretrainLosses:
        x_proj, x_sub_proj = _project_inputs(self.transfer_d, g, sub,
                                             self.normalize_input)
        feats = self.core.extract_features(g, sub, x_proj, x_sub_proj, train)

        im = self.head_mlp(feats.interaction_map)                # 2d -> d

        kl = kl_loss(feats.kl_node, g.node_graph, g.node_mask,
                     g.graph_mask, mode=self.kl_mode,
                     axis_name=self.axis_name)

        if self.readout == "sum":
            noisy_readout = segment_sum(feats.noisy, g.node_graph,
                                        g.num_graphs, mask=g.node_mask)
        else:
            noisy_readout = self.s2s(feats.noisy, g.node_graph,
                                     g.num_graphs, mask=g.node_mask)
        contrastive = contrastive_infonce(noisy_readout, feats.clean_readout,
                                          g.graph_mask,
                                          axis_name=self.axis_name)

        if self.recons_type == "adj":
            # banded adjacency (if packed) turns the edge cross term into
            # MXU matmuls; XLA CSEs the block build with the encoders'
            band = _resolve_band(g) if self.recons_impl == "gram" else None
            recon = recon_adj_loss(im, g.senders, g.receivers, g.edge_mask,
                                   g.node_mask, axis_name=self.axis_name,
                                   impl=self.recons_impl, band=band)
        elif self.recons_type == "logM":
            # explicit call args win; otherwise the batch carries them
            # (batch_iterator(logm_k=k) attaches block-diagonal targets)
            if logm_targets is None:
                logm_targets = g.logm_targets
                logm_weights = g.logm_weights
            if logm_targets is None or logm_weights is None:
                raise ValueError("recons_type='logM' requires logm targets "
                                 "(pass them or pack with logm_k)")
            recon = recon_logm_loss(im, logm_targets, logm_weights,
                                    self.k_transition)
        else:
            recon = jnp.asarray(0.0)

        return PretrainLosses(kl=kl, contrastive=contrastive,
                              reconstruction=recon)


class FinetuneModel(nn.Module):
    """``Mainmodel_finetuning`` — fresh heads around the pretrained core.

    forward (models.py:501-520): project -> core.extract_features ->
    MLP(2d->d) -> Set2Set(->2d) -> predict(2d->d->num_out); sigmoid unless
    ``regression``.
    """

    in_dim: int
    num_out: int = 1
    hidden: int = 64
    d_transfer: int = 32
    encoder: str = "GIN"
    num_layers: int = 4
    num_heads: int = 8
    readout: str = "sum"
    use_att: bool = True
    regression: bool = False   # True for ZINC/Peptides-struct/FreeSolv/ESOL
    deterministic: bool = False
    normalize_input: bool = True
    subgraph_mode: str = "coo"
    axis_name: Optional[str] = None

    def setup(self):
        self.transfer_d = nn.Dense(self.d_transfer, use_bias=False,
                                   name="transfer_d")
        self.core = SCGIBCore(hidden=self.hidden, encoder=self.encoder,
                              num_layers=self.num_layers,
                              num_heads=self.num_heads, readout=self.readout,
                              use_att=self.use_att,
                              deterministic=self.deterministic,
                              axis_name=self.axis_name,
                              subgraph_mode=self.subgraph_mode,
                              name="core")
        self.head_mlp = MLP2(self.hidden, self.hidden, name="head_mlp")
        self.s2s = Set2Set(self.hidden, name="s2s")
        self.predict = MLP2(self.hidden, self.num_out, name="predict")

    def __call__(self, g: GraphBatch, sub: SubgraphBatch,
                 train: bool = True) -> jnp.ndarray:
        x_proj, x_sub_proj = _project_inputs(self.transfer_d, g, sub,
                                             self.normalize_input)
        feats = self.core.extract_features(g, sub, x_proj, x_sub_proj, train)
        im = self.head_mlp(feats.interaction_map)                # 2d -> d
        pooled = self.s2s(im, g.node_graph, g.num_graphs,
                          mask=g.node_mask)                      # [G, 2d]
        out = self.predict(pooled)
        if self.regression:
            return out
        return jax.nn.sigmoid(out)


class DomainAdaptModel(nn.Module):
    """``Mainmodel_domainadapt`` (models.py:107-281): reconstruct the
    Set2Set readout of the raw features from the interaction map; loss is the
    unnormalized squared error (models.py:276-281)."""

    in_dim: int
    hidden: int = 64
    d_transfer: int = 32
    encoder: str = "GIN"
    num_layers: int = 4
    num_heads: int = 8
    readout: str = "sum"
    use_att: bool = True
    deterministic: bool = False
    normalize_input: bool = True
    subgraph_mode: str = "coo"
    axis_name: Optional[str] = None

    def setup(self):
        self.transfer_d = nn.Dense(self.d_transfer, use_bias=False,
                                   name="transfer_d")
        self.core = SCGIBCore(hidden=self.hidden, encoder=self.encoder,
                              num_layers=self.num_layers,
                              num_heads=self.num_heads, readout=self.readout,
                              use_att=self.use_att,
                              deterministic=self.deterministic,
                              axis_name=self.axis_name,
                              subgraph_mode=self.subgraph_mode,
                              name="core")
        self.head_mlp = MLP2(self.hidden, self.hidden, name="head_mlp")
        self.s2s = Set2Set(self.hidden, name="s2s")
        self.s2s_rev = Set2Set(self.in_dim, name="s2s_rev")
        self.r_transfer_d = MLP2(self.hidden, 2 * self.in_dim,
                                 name="r_transfer_d")

    def __call__(self, g: GraphBatch, sub: SubgraphBatch,
                 train: bool = True) -> jnp.ndarray:
        x = l2_normalize(g.node_feat) if self.normalize_input else \
            g.node_feat
        x_proj, x_sub_proj = _project_inputs(self.transfer_d, g, sub,
                                             self.normalize_input)
        feats = self.core.extract_features(g, sub, x_proj, x_sub_proj, train)
        im = self.head_mlp(feats.interaction_map)
        pooled = self.s2s(im, g.node_graph, g.num_graphs, mask=g.node_mask)
        pred = self.r_transfer_d(pooled)                         # [G, 2F]
        # "org" features in the reference were already normalized by its
        # train loop (train_moleculenetBACE.py:37-38), so the target uses
        # the same x fed to the encoder projection
        target = self.s2s_rev(x, g.node_graph, g.num_graphs,
                              mask=g.node_mask)                  # [G, 2F]
        m = g.graph_mask.astype(pred.dtype)[:, None]
        return jnp.sum(((pred - target) ** 2) * m)
