"""S-CGIB pretraining losses as pure, vectorized JAX functions.

Replaces the reference's per-graph Python loops and batch-dense ops:

  * ``batched_semi_loss`` InfoNCE contrastive   (models.py:611-629)
  * KL compression term                          (models.py:657-659)
  * adjacency reconstruction                     (models.py:762-768)
  * k-step logM reconstruction                   (models.py:770-782)

All functions take validity masks so padded graphs/nodes contribute nothing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.segment import segment_sum


def l2_normalize(x: jnp.ndarray, axis: int = -1,
                 eps: float = 1e-12) -> jnp.ndarray:
    """torch ``F.normalize`` semantics: x / max(||x||, eps).

    The clamp sits INSIDE the sqrt (max(sum(x^2), eps^2) — identical
    forward: sqrt is monotone) so the backward is finite at x == 0.
    With ``sqrt`` outside, an all-zero row gives d sqrt(0) = inf and the
    clamp's zero branch multiplies it into 0 * inf = NaN — which is how
    the round-4 reference-duration curriculum died at stage-1 epoch 4:
    after 80 sharpening epochs of stage 0, one real graph's ReLU'd
    readout went exactly zero and the InfoNCE backward NaN'd the whole
    model (regression test: test_losses.py::
    test_contrastive_zero_readout_grads_finite)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, eps * eps))


def contrastive_infonce(z1: jnp.ndarray, z2: jnp.ndarray,
                        graph_mask: jnp.ndarray,
                        tau: float = 1.0,
                        axis_name: Optional[str] = None) -> jnp.ndarray:
    """InfoNCE between noisy-core readouts z1 and clean readouts z2, [G, d].

    Vectorizes models.py:611-629 exactly: with f = exp(cos_sim / tau),
      loss_i = -log( f(z1_i, z2_i)
                     / (sum_j f(z1_i, z1_j) + sum_j f(z1_i, z2_j)
                        - f(z1_i, z1_i)) )
    averaged over real graphs.  (The reference's inner blocking over
    ``batch_size`` chunks is a memory detail, not a math change.)

    With ``axis_name`` (data-parallel shard_map), the denominator spans the
    GLOBAL batch: columns are all-gathered across the mesh axis so the loss
    equals the single-device computation over the union of shards — the
    batch-global denominator requirement of SURVEY.md §7.3.
    """
    m = graph_mask.astype(z1.dtype)
    z1n = l2_normalize(z1)
    z2n = l2_normalize(z2)
    local_g = z1.shape[0]
    if axis_name is None:
        z1_cols, z2_cols, m_cols = z1n, z2n, m
        diag_off = 0
    else:
        z1_cols = jax.lax.all_gather(z1n, axis_name)     # [D, G, d]
        z2_cols = jax.lax.all_gather(z2n, axis_name)
        m_cols = jax.lax.all_gather(m, axis_name).reshape(-1)
        z1_cols = z1_cols.reshape(-1, z1n.shape[-1])
        z2_cols = z2_cols.reshape(-1, z2n.shape[-1])
        diag_off = jax.lax.axis_index(axis_name) * local_g
    refl = jnp.exp(z1n @ z1_cols.T / tau)     # [G, G_total]
    betw = jnp.exp(z1n @ z2_cols.T / tau)
    refl_sum = refl @ m_cols                  # mask columns
    betw_sum = betw @ m_cols
    idx = jnp.arange(local_g)
    refl_diag = refl[idx, idx + diag_off]
    betw_diag = betw[idx, idx + diag_off]
    denom = refl_sum + betw_sum - refl_diag
    loss_i = -jnp.log(betw_diag / jnp.maximum(denom, 1e-30))
    total = jnp.sum(loss_i * m)
    count = jnp.sum(m)
    if axis_name is not None:
        # LOCAL numerator over a GLOBAL count: inside shard_map the
        # differentiated loss must not be a psum'd (replicated) scalar —
        # psum'ing grads of a replicated loss over-counts the collective
        # transpose contributions.  The global value is sum-of-shards
        # (psum AFTER grad, in parallel/dp.py).
        count = jax.lax.psum(count, axis_name)
    return total / jnp.maximum(count, 1.0)


def contrastive_infonce_replicated(z1: jnp.ndarray, z2: jnp.ndarray,
                                   graph_mask: jnp.ndarray,
                                   own_mask: jnp.ndarray,
                                   axis_name: str,
                                   tau: float = 1.0) -> jnp.ndarray:
    """InfoNCE for the node-sharded path: readouts z1/z2 are GLOBAL
    [G_total, d] arrays already replicated on every shard (psum'd segment
    sums), and each shard contributes only the loss terms of the graphs it
    OWNS (``own_mask``, a disjoint cover of the real graphs).

    Same math as ``contrastive_infonce`` (models.py:611-629); the
    local-numerator / global-count convention keeps psum-after-grad exact
    (see the note in ``contrastive_infonce``).
    """
    m = graph_mask.astype(z1.dtype)
    o = (own_mask & graph_mask).astype(z1.dtype)
    z1n = l2_normalize(z1)
    z2n = l2_normalize(z2)
    refl = jnp.exp(z1n @ z1n.T / tau)
    betw = jnp.exp(z1n @ z2n.T / tau)
    refl_sum = refl @ m
    betw_sum = betw @ m
    diag = jnp.arange(z1.shape[0])
    denom = refl_sum + betw_sum - refl[diag, diag]
    loss_i = -jnp.log(betw[diag, diag] / jnp.maximum(denom, 1e-30))
    total = jnp.sum(loss_i * o)
    count = jax.lax.psum(jnp.sum(o), axis_name)
    return total / jnp.maximum(count, 1.0)


def kl_loss(kl_node: jnp.ndarray,
            node_graph: jnp.ndarray,
            node_mask: jnp.ndarray,
            graph_mask: jnp.ndarray,
            mode: str = "corrected",
            axis_name: Optional[str] = None) -> jnp.ndarray:
    """Reduce the per-node KL matrix [N, d] to a scalar.

    mode='corrected': masked mean over all real nodes (the paper's Eq. 12).
    mode='reference': mean over the **last real graph only**, replicating the
      accumulation bug at models.py:659 where
      ``KL_tensor_all = torch.cat((KL_tensor, KL_tensor), 0)`` discards all
      graphs but the last (duplication leaves the mean unchanged).

    ``axis_name``: mean over the global (cross-shard) node population; in
    'reference' mode each shard picks its own last graph (the sequential
    notion of "last" has no global analog — documented deviation).
    """
    if mode == "corrected":
        m = node_mask.astype(kl_node.dtype)
        total = jnp.sum(kl_node * m[:, None])
        count = jnp.sum(m) * kl_node.shape[-1]
    elif mode == "reference":
        last = jnp.sum(graph_mask.astype(jnp.int32)) - 1
        sel = (node_graph == last) & node_mask
        w = sel.astype(kl_node.dtype)
        total = jnp.sum(kl_node * w[:, None])
        count = jnp.sum(w) * kl_node.shape[-1]
    else:
        raise ValueError(f"unknown kl mode {mode!r}")
    if axis_name is not None:
        # local numerator / global count (see contrastive_infonce note)
        count = jax.lax.psum(count, axis_name)
    return total / jnp.maximum(count, 1.0)


def recon_adj_loss(interaction_map: jnp.ndarray,
                   senders: jnp.ndarray,
                   receivers: jnp.ndarray,
                   edge_mask: jnp.ndarray,
                   node_mask: jnp.ndarray,
                   axis_name: Optional[str] = None,
                   impl: str = "gram",
                   band=None) -> jnp.ndarray:
    """|| IM IM^T - A ||_F^2 / N_real over the batch-dense adjacency
    (models.py:762-768; the reference's denominator ``row_num`` is the real
    node count; its cross-graph off-diagonal zero blocks are reproduced
    exactly because padded rows of IM are zero).

    impl='gram' (default): the TPU-native O(N d^2) form.  With A binary
    (the packer dedups edges) the expansion
        ||IM IM^T - A||^2 = tr((IM^T IM)^2) - 2 sum_e IM_s.IM_e + |E|
    replaces the N x N gram with the d x d feature gram (one small MXU
    matmul) and a per-edge SDDMM dot — identical value, no N^2
    materialization (SURVEY.md §7 'dense N^2 losses at scale').

    impl='dense': the literal batch-dense computation (the reference's
    ``adj().to_dense()`` + GEMM, kept for parity tests).

    ``axis_name`` (data parallel): per-shard gram psum'd so the value is
    EXACTLY the single-device loss over the union batch, including
    cross-shard zero blocks.  Per-shard output follows the
    local-numerator convention (see contrastive_infonce).
    """
    im = interaction_map * node_mask.astype(interaction_map.dtype)[:, None]
    n_real = jnp.sum(node_mask.astype(jnp.float32))
    em = edge_mask.astype(im.dtype)

    if impl == "dense":
        n = im.shape[0]
        if axis_name is None:
            cols = im
            col_off = 0
        else:
            cols = jax.lax.all_gather(im, axis_name).reshape(
                -1, im.shape[-1])
            col_off = jax.lax.axis_index(axis_name) * n
        gram = im @ cols.T                  # [N, N_global]
        adj = jnp.zeros(gram.shape, im.dtype).at[
            senders, receivers + col_off].add(em)
        diff = gram - adj
        total = jnp.sum(diff * diff)
        if axis_name is not None:
            n_real = jax.lax.psum(n_real, axis_name)
        return total / jnp.maximum(n_real, 1.0)

    if impl != "gram":
        raise ValueError(f"unknown recon impl {impl!r}")

    g_local = im.T @ im                     # [D, D] feature gram
    if band is not None:
        # banded MXU form of the edge cross term: with the banded
        # block-dense adjacency A (masked edge weights, symmetric by
        # packer construction), sum_e IM_s.IM_r = sum(IM * (A IM)).
        # Forward AND backward are banded matmuls (banded_spmm's custom
        # VJP) — the COO form below costs ~360 us/step at bench shapes
        # in scatter-add gather transposes (profiler, round 3).
        from ..ops.pallas.banded import spmm_banded_fast

        blocks, col_off = band
        cross = jnp.sum(im * spmm_banded_fast(blocks, col_off, im))
    else:
        # SDDMM: per-edge dot of endpoint rows (padding edges masked)
        dots = jnp.sum(jnp.take(im, senders, axis=0)
                       * jnp.take(im, receivers, axis=0), axis=-1)
        cross = jnp.sum(dots * em)
    e_count = jnp.sum(em)
    if axis_name is None:
        total = jnp.sum(g_local * g_local) - 2.0 * cross + e_count
        return total / jnp.maximum(n_real, 1.0)
    # DP: ||sum_i G_i||^2 = sum_i tr(G_i @ G_global); writing the per-shard
    # output as tr(G_local @ psum(G)) makes sum-of-shards equal the global
    # loss with AD-exact cotangents under shard_map (each G_i receives 2G).
    g_global = jax.lax.psum(g_local, axis_name)
    total = jnp.sum(g_local * g_global) - 2.0 * cross + e_count
    n_real = jax.lax.psum(n_real, axis_name)
    return total / jnp.maximum(n_real, 1.0)


def recon_logm_loss(interaction_map: jnp.ndarray,
                    targets: jnp.ndarray,
                    weights: jnp.ndarray,
                    k_transition: int) -> jnp.ndarray:
    """Per-graph k-step transition reconstruction (models.py:770-782):
    (1/k) * sum_k sum_g || IM_g IM_g^T - logM_{g,k} ||^2 / n_g^2.

    ``targets`` [k, N, N] block-diagonal padded logMs, ``weights`` [N, N]
    with 1/n_g^2 inside each graph block, 0 elsewhere (pack_logm_targets).
    """
    gram = interaction_map @ interaction_map.T
    diff = gram[None] - targets               # [k, N, N]
    per_k = jnp.sum(diff * diff * weights[None], axis=(1, 2))
    return jnp.sum(per_k) / float(k_transition)


def _safe_log(x: jnp.ndarray) -> jnp.ndarray:
    """log(x) with torch's BCELoss clamp at -100 AND a NaN-free gradient.

    ``maximum(log(x), -100)`` is NOT safe: its VJP multiplies the branch
    selector (0) by the inner gradient (1/x = inf at x=0), and 0 * inf
    is NaN.  The double-where evaluates log only on a safe input, so the
    clamped region gets value -100 and gradient exactly 0 — the same as
    torch's clamp backward."""
    zero = x <= 0.0
    return jnp.where(zero, -100.0, jnp.log(jnp.where(zero, 1.0, x)))


def bce_loss(probs: jnp.ndarray, targets: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """``nn.BCELoss`` over probabilities (models.py:522-525), NaN-masked
    multi-task support a la MetricWrapper 'ignore-flatten'.

    torch clamps the LOG outputs at -100 (not the probabilities): in
    float32 a saturated sigmoid returns exactly 1.0, where clipping p to
    1-1e-12 is a no-op (rounds back to 1.0) and log(1-p) = -inf turns
    0 * -inf into NaN.  The log-clamp keeps both the value and the
    gradient finite, matching torch bit-for-bit at saturation."""
    targets = jnp.where(jnp.isnan(targets), 0.0, targets)  # masked anyway
    ll = -(targets * _safe_log(probs)
           + (1.0 - targets) * _safe_log(1.0 - probs))
    if mask is None:
        return jnp.mean(ll)
    m = mask.astype(ll.dtype)
    return jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1.0)


def bce_with_logits_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                         mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """``nn.BCEWithLogitsLoss`` (models.py:536-539), numerically stable."""
    ll = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    if mask is None:
        return jnp.mean(ll)
    m = mask.astype(ll.dtype)
    return jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1.0)


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """``nn.CrossEntropyLoss`` with integer class labels (models.py:527-530).

    Note the reference applies it on *sigmoided* scores (train_tudataset.py);
    we take whatever the head produced, identically.
    """
    shifted = logits - jnp.max(logits, axis=-1, keepdims=True)
    log_probs = shifted - jnp.log(
        jnp.sum(jnp.exp(shifted), axis=-1, keepdims=True))
    picked = jnp.take_along_axis(log_probs, labels[:, None].astype(jnp.int32),
                                 axis=-1)[:, 0]
    if mask is None:
        return -jnp.mean(picked)
    m = mask.astype(picked.dtype)
    return -jnp.sum(picked * m) / jnp.maximum(jnp.sum(m), 1.0)


def rmse_loss(scores: jnp.ndarray, targets: jnp.ndarray,
              mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """sqrt(MSE) (models.py:532-535)."""
    se = (scores - targets) ** 2
    if mask is None:
        return jnp.sqrt(jnp.mean(se))
    m = mask.astype(se.dtype)
    return jnp.sqrt(jnp.sum(se * m) / jnp.maximum(jnp.sum(m), 1.0))


def mae_loss(scores: jnp.ndarray, targets: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """L1 loss (models.py:541-543)."""
    ae = jnp.abs(scores - targets)
    if mask is None:
        return jnp.mean(ae)
    m = mask.astype(ae.dtype)
    return jnp.sum(ae * m) / jnp.maximum(jnp.sum(m), 1.0)
