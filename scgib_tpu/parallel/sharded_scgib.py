"""Full-model node-sharded S-CGIB pretraining (the CP/SP analog).

This is the training-path completion of the edge-partitioned encoder
(partitioned_gin.py): the ENTIRE pretrain step — twin encoders, the
compression gate's per-graph statistics, the core<->candidate attention
softmax, and all three losses — runs with node features sharded over the
mesh, so one graph batch too large for a single chip trains across
devices (SURVEY.md §2.5 SP/CP row, §7.3 "multi-host graph partitioning").

Design:
  * Encoder1 message passing: bidirectional ppermute ring halo
    (ring_partitioned_spmm) — cross-shard traffic is 2R neighbor blocks.
  * Encoder2 + candidate embeddings: ego-nets are packed onto their
    CENTER node's shard (sharded_batch.py), so the sub-graph encoder and
    the candidate segment-sum are fully local.
  * Per-graph reductions (readouts, compression mean/std, per-graph
    BatchNorm, attention softmax): psum'd global segment ops
    (sharded_ops.py) over GLOBAL graph ids — graphs may span shards.
  * Losses: local-numerator / global-denominator convention (losses.py),
    with the reconstruction SDDMM term riding the same ppermute ring
    (ring_sddmm_sum).  psum-after-grad in the step fn is then the EXACT
    gradient of the union-batch loss (tests/test_sharded_scgib.py).

The parameter/batch_stats trees are IDENTICAL to ``models.scgib
.PretrainModel`` — one checkpoint drives the single-device, DP, and
node-sharded paths.  Unlike DP, ``kl_mode='reference'`` (the last-graph
bug, models.py:659) is EXACT here: "last graph" is a global notion and
its nodes simply span shards.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.layers import MLP2
from ..models.losses import (contrastive_infonce_replicated, kl_loss,
                             l2_normalize)
from ..models.scgib import PretrainLosses
from ..models.encoders import GIN
from ..ops.segment import segment_sum
from .edge_partition import ring_partitioned_spmm
from .partitioned_gin import PartitionedGIN
from .sharded_batch import ShardedPretrainBatch
from .sharded_ops import (gseg_softmax, gseg_std_mean, gseg_sum,
                          ring_sddmm_sum)



def _model_rngs(rng):
    """RNG streams for model.apply: 'noise' (compression gate + feature
    noise) always; 'dropout' derived for encoders that use flax Dropout
    (the graph transformer, reference models.py:860) — flax ignores
    streams a module does not request."""
    import jax as _jax

    return {"noise": rng, "dropout": _jax.random.fold_in(rng, 0x5eed)}

class ShardedSegmentBatchNorm(nn.Module):
    """Per-graph BatchNorm with cross-shard segment statistics — the
    node-sharded form of ``models.layers.SegmentBatchNorm`` (same param /
    batch_stats tree).  Running stats are the global per-segment averages,
    computed identically on every shard, so the replicated state never
    diverges."""

    axis_name: str
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, segment_ids, num_segments, mask=None,
                 train: bool = True):
        from ..ops.segment import segment_broadcast
        from .sharded_ops import gseg_count, gseg_mean

        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        if train:
            mean_g = gseg_mean(x, segment_ids, num_segments,
                               self.axis_name, mask)
            mean = segment_broadcast(mean_g, segment_ids, num_segments)
            centered = x - mean
            count = gseg_count(segment_ids, num_segments, self.axis_name,
                               mask)
            var_g = gseg_sum(centered * centered, segment_ids,
                             num_segments, self.axis_name, mask)
            var_g = var_g / jnp.maximum(count, 1.0)[:, None]
            var = segment_broadcast(var_g, segment_ids, num_segments)
            if not self.is_initializing():
                seg_mask = count > 0
                n_seg = jnp.maximum(
                    jnp.sum(seg_mask.astype(jnp.float32)), 1.0)
                unb = var_g * (count / jnp.maximum(count - 1.0, 1.0))[:, None]
                wm = seg_mask.astype(jnp.float32)[:, None]
                avg_mean = jnp.sum(mean_g * wm, axis=0) / n_seg
                avg_var = jnp.sum(unb * wm, axis=0) / n_seg
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * avg_mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * avg_var)
        else:
            mean = ra_mean.value
            var = ra_var.value

        y = (x - mean) / jnp.sqrt(var + self.eps)
        return y * scale + bias


class ShardedCompressor(nn.Module):
    """Gate scorer d -> d -> perGraphBN -> ReLU -> 1 (models.py:589-593),
    param-tree identical to ``models.scgib.Compressor``."""

    hidden: int
    axis_name: str

    @nn.compact
    def __call__(self, h, segment_ids, num_segments, mask=None,
                 train: bool = True):
        x = nn.Dense(self.hidden, name="fc1")(h)
        x = ShardedSegmentBatchNorm(self.axis_name, name="bn")(
            x, segment_ids, num_segments, mask=mask, train=train)
        x = nn.relu(x)
        return nn.Dense(1, name="fc2")(x)


class ShardedCoreFeatures(NamedTuple):
    interaction_map: jnp.ndarray   # [P, 2d] shard-local
    kl_node: jnp.ndarray           # [P, d] shard-local
    noisy: jnp.ndarray             # [P, d] shard-local
    clean_readout: jnp.ndarray     # [G_total, d] replicated


class ShardedSCGIBCore(nn.Module):
    """Node-sharded twin encoders + compression + attention; called INSIDE
    shard_map with the shard axis already stripped.  Mirrors
    ``models.scgib.SCGIBCore`` (readout='sum' only)."""

    axis_name: str
    hidden: int = 64
    num_layers: int = 4
    radius: int = 1
    use_att: bool = True
    gate_bias: float = 1e-4
    std_eps: float = 1e-7
    deterministic: bool = False

    def setup(self):
        self.encoder1 = PartitionedGIN(hidden=self.hidden,
                                       num_convs=self.num_layers,
                                       radius=self.radius,
                                       axis_name=self.axis_name,
                                       name="encoder1")
        # ego-nets are shard-local; sync-BN makes the statistics global
        self.encoder2 = GIN(hidden=self.hidden, num_convs=self.num_layers,
                            axis_name=self.axis_name, use_pallas=False,
                            name="encoder2")
        self.compressor = ShardedCompressor(self.hidden, self.axis_name,
                                            name="compressor")
        self.attn_layer = nn.Dense(1, name="attn_layer")

    def compression(self, h, b: ShardedPretrainBatch, train: bool):
        num_graphs = b.graph_mask.shape[-1]
        p = self.compressor(h, b.node_graph, num_graphs,
                            mask=b.node_mask, train=train)
        if self.deterministic:
            lam = jax.nn.sigmoid(p)
        else:
            key = self.make_rng("noise")
            eps = jax.random.uniform(key, p.shape, p.dtype,
                                     minval=self.gate_bias,
                                     maxval=1.0 - self.gate_bias)
            lam = jax.nn.sigmoid(jnp.log(eps) - jnp.log1p(-eps) + p)
        lam_neg = 1.0 - lam

        h_static = jax.lax.stop_gradient(h)
        std_g, mean_g = gseg_std_mean(h_static, b.node_graph, num_graphs,
                                      self.axis_name, mask=b.node_mask)
        mean_n = mean_g[b.node_graph]
        std_n = std_g[b.node_graph]

        noisy_mean = lam * h + lam_neg * mean_n
        noisy_std = lam_neg * std_n
        if self.deterministic:
            noisy = noisy_mean
        else:
            key = self.make_rng("noise")
            u = jax.random.uniform(key, noisy_mean.shape, noisy_mean.dtype)
            noisy = noisy_mean + u * noisy_std
        noisy = noisy * b.node_mask.astype(noisy.dtype)[:, None]

        denom = std_n + self.std_eps
        term1 = 0.5 * (noisy_std ** 2) / (denom ** 2)
        dev = (noisy_mean - mean_n) / denom
        term2_g = gseg_sum(dev * dev, b.node_graph, num_graphs,
                           self.axis_name, mask=b.node_mask)
        kl_node = term1 + term2_g[b.node_graph]
        kl_node = kl_node * b.node_mask.astype(kl_node.dtype)[:, None]
        return noisy, kl_node

    def __call__(self, b: ShardedPretrainBatch, x_proj, x_sub_proj,
                 train: bool = True) -> ShardedCoreFeatures:
        num_graphs = b.graph_mask.shape[-1]
        h = self.encoder1(x_proj, b.senders_owner_local, b.receivers_local,
                          b.edge_mask, node_mask=b.node_mask, train=train)
        h_sub = self.encoder2(x_sub_proj, b.sub_senders, b.sub_receivers,
                              node_mask=b.sub_node_mask,
                              edge_mask=b.sub_edge_mask, train=train)

        clean_readout = gseg_sum(h, b.node_graph, num_graphs,
                                 self.axis_name, mask=b.node_mask)
        noisy, kl_node = self.compression(h, b, train)
        cand = segment_sum(h_sub, b.sub_center_local, x_proj.shape[0],
                           mask=b.sub_node_mask, indices_are_sorted=False)

        if not self.use_att:
            im = jnp.concatenate([noisy, cand], axis=-1)
            return ShardedCoreFeatures(im, kl_node, noisy, clean_readout)

        noisy_readout = gseg_sum(noisy, b.node_graph, num_graphs,
                                 self.axis_name, mask=b.node_mask)
        inter = jnp.concatenate(
            [noisy_readout[b.node_graph], cand], axis=-1)
        att = self.attn_layer(inter)[:, 0]
        alpha = gseg_softmax(att, b.node_graph, num_graphs,
                             self.axis_name, mask=b.node_mask)
        cand_att = cand * alpha[:, None]
        im = jnp.concatenate([noisy, cand_att], axis=-1)
        im = im * b.node_mask.astype(im.dtype)[:, None]
        return ShardedCoreFeatures(im, kl_node, noisy, clean_readout)


class ShardedPretrainModel(nn.Module):
    """Node-sharded ``PretrainModel`` — identical parameter tree, losses
    returned per-shard in local-numerator form (psum of the per-shard
    values/grads equals the single-device union-batch loss/grads)."""

    axis_name: str
    in_dim: int
    hidden: int = 64
    d_transfer: int = 32
    num_layers: int = 4
    radius: int = 1
    use_att: bool = True
    kl_mode: str = "corrected"
    deterministic: bool = False
    normalize_input: bool = True

    def setup(self):
        self.transfer_d = nn.Dense(self.d_transfer, use_bias=False,
                                   name="transfer_d")
        self.core = ShardedSCGIBCore(axis_name=self.axis_name,
                                     hidden=self.hidden,
                                     num_layers=self.num_layers,
                                     radius=self.radius,
                                     use_att=self.use_att,
                                     deterministic=self.deterministic,
                                     name="core")
        self.head_mlp = MLP2(self.hidden, self.hidden, name="head_mlp")

    def __call__(self, b: ShardedPretrainBatch,
                 train: bool = True) -> PretrainLosses:
        num_graphs = b.graph_mask.shape[-1]
        x = l2_normalize(b.node_feat) if self.normalize_input else \
            b.node_feat
        x_sub = l2_normalize(b.sub_node_feat) if self.normalize_input else \
            b.sub_node_feat
        x_proj = self.transfer_d(x)
        x_sub_proj = self.transfer_d(x_sub)
        feats = self.core(b, x_proj, x_sub_proj, train)

        im = self.head_mlp(feats.interaction_map)

        # KL: local nodes / global count.  'reference' mode is exact here
        # (global last graph; its nodes may span shards).
        kl = kl_loss(feats.kl_node, b.node_graph, b.node_mask,
                     b.graph_mask, mode=self.kl_mode,
                     axis_name=self.axis_name)

        noisy_readout = gseg_sum(feats.noisy, b.node_graph, num_graphs,
                                 self.axis_name, mask=b.node_mask)
        contrastive = contrastive_infonce_replicated(
            noisy_readout, feats.clean_readout, b.graph_mask, b.graph_own,
            self.axis_name)

        recon = self._recon_adj(im, b)
        return PretrainLosses(kl=kl, contrastive=contrastive,
                              reconstruction=recon)

    def _recon_adj(self, im, b: ShardedPretrainBatch):
        """Gram-form ||IM IM^T - A||^2 / N (losses.recon_adj_loss) with the
        SDDMM edge term riding the ppermute ring."""
        im = im * b.node_mask.astype(im.dtype)[:, None]
        g_local = im.T @ im
        g_global = jax.lax.psum(g_local, self.axis_name)
        cross = ring_sddmm_sum(im, b.senders_owner_local,
                               b.receivers_local, b.edge_mask,
                               self.radius, self.axis_name)
        e_count = jnp.sum(b.edge_mask.astype(im.dtype))
        n_real = jax.lax.psum(
            jnp.sum(b.node_mask.astype(jnp.float32)), self.axis_name)
        total = jnp.sum(g_local * g_global) - 2.0 * cross + e_count
        return total / jnp.maximum(n_real, 1.0)


def make_sharded_pretrain_step(model: ShardedPretrainModel, tx, mesh):
    """Jitted full-model node-sharded training step.

    Signature: ``(state, batch, rngs[S]) -> (state, losses)`` with ``batch``
    a ``ShardedPretrainBatch`` (leading shard axis) and ``rngs`` one PRNG
    key per shard.  Per-shard local-numerator losses/grads are psum'd, so
    the returned losses and the parameter update EXACTLY match a
    single-device step on the union batch (tests/test_sharded_scgib.py).
    """
    import optax
    from jax.sharding import PartitionSpec as P

    from ..train.trainer import TrainState
    from .dp import shard_map

    axis = model.axis_name

    def shard_step(state: TrainState, batch, rng):
        b = jax.tree_util.tree_map(lambda x: x[0], batch)
        rng = rng[0]

        def loss_fn(params, batch_stats):
            losses, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                b, train=True, mutable=["batch_stats"],
                rngs=_model_rngs(rng))
            return losses.total, (losses, mutated["batch_stats"])

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (losses, new_bs)), grads = grad_fn(state.params,
                                               state.batch_stats)
        grads = jax.lax.psum(grads, axis)
        losses = jax.lax.psum(losses, axis)
        # global-statistics BN: identical on every shard; pmean is a
        # cheap invariance safeguard
        new_bs = jax.lax.pmean(new_bs, axis)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, batch_stats=new_bs,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, losses

    sharded = shard_map(
        shard_step, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))
