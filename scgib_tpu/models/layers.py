"""Shared neural layers: masked BatchNorm and the 2-layer MLP.

Masked BatchNorm matters because our batches are padded: statistics must be
computed over *real* nodes only, otherwise padding would skew the mean/var
that the reference's ``nn.BatchNorm1d`` computes over the exact node set
(reference models.py:64, 591).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over rows with a validity mask.

    Matches torch ``nn.BatchNorm1d`` semantics: biased variance for the
    normalization, *unbiased* variance for the running stats, momentum 0.1,
    eps 1e-5, affine.

    ``axis_name``: sync-BN across a data-parallel mesh axis — train-mode
    statistics are psum-reduced over all shards so a sharded batch
    normalizes exactly like the same batch on one device.
    """

    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None
    # one-pass moments (default): sum and sum-of-squares in a SINGLE
    # sweep over x (one multi-output XLA reduction fusion), then
    # var = E[x^2] - mean^2.  The round-4/5 traces showed the step is
    # op-count/latency-bound, and the two-pass form costs an extra
    # [N, F] reduction dispatch per BN layer (8 layers/step) plus a
    # second psum round under sync-BN.  Cancellation bound: activations
    # here are O(1-30) post-conv, so E[x^2]-mean^2 loses <= ~3 f32
    # digits -> var error ~1e-4 relative, inside every oracle
    # tolerance; set two_pass=True to restore the centered form.
    two_pass: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 train: bool = True) -> jnp.ndarray:
        import jax

        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        if train and self.two_pass:
            # two-pass (mean, then centered variance) for float32 stability;
            # sync-BN pays one extra [F]-sized psum for it.
            if mask is None:
                count = jnp.asarray(float(x.shape[0]), jnp.float32)
                total = jnp.sum(x, axis=0)
            else:
                m = mask.astype(x.dtype)[:, None]
                count = jnp.sum(m)
                total = jnp.sum(x * m, axis=0)
            if self.axis_name is not None:
                count = jax.lax.psum(count, self.axis_name)
                total = jax.lax.psum(total, self.axis_name)
            count = jnp.maximum(count, 1.0)
            mean = total / count
            centered_sq = (x - mean) ** 2
            if mask is None:
                var_total = jnp.sum(centered_sq, axis=0)
            else:
                var_total = jnp.sum(centered_sq * m, axis=0)
            if self.axis_name is not None:
                var_total = jax.lax.psum(var_total, self.axis_name)
            var = var_total / count
        elif train:
            # one-pass: both reductions read x once (one multi-output
            # fusion); under sync-BN the (sum, sumsq, count) triple rides
            # ONE concatenated psum.  The concat+slice packing ONLY pays
            # for itself when there is a collective to amortize — on a
            # single device it showed up as ~22 us/step of pure
            # concatenate ops in the round-5 trace, so it is gated on
            # axis_name.
            if mask is None:
                xm = x
                count = jnp.asarray(float(x.shape[0]), jnp.float32)
                total = jnp.sum(xm, axis=0)
                total_sq = jnp.sum(xm * x, axis=0)
            else:
                m = mask.astype(x.dtype)[:, None]
                xm = x * m
                count = jnp.sum(m)
                total = jnp.sum(xm, axis=0)
                total_sq = jnp.sum(xm * x, axis=0)
            if self.axis_name is not None:
                packed = jax.lax.psum(
                    jnp.concatenate([total, total_sq, count[None]]),
                    self.axis_name)
                total = packed[:features]
                total_sq = packed[features:2 * features]
                count = packed[-1]
            count = jnp.maximum(count, 1.0)
            mean = total / count
            var = jnp.maximum(total_sq / count - mean * mean, 0.0)
        else:
            mean = ra_mean.value
            var = ra_var.value

        if train and not self.is_initializing():
            unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
            ra_mean.value = ((1 - self.momentum) * ra_mean.value
                             + self.momentum * mean)
            ra_var.value = ((1 - self.momentum) * ra_var.value
                            + self.momentum * unbiased)

        # folded affine: y = x*a + b with a = scale/sqrt(var+eps),
        # b = bias - mean*a — one FMA per element instead of
        # sub/div/mul/add (same values to ~1 ulp)
        a = scale * jax.lax.rsqrt(var + self.eps)
        return x * a + (bias - mean * a)


class SegmentBatchNorm(nn.Module):
    """BatchNorm whose train-mode statistics are computed *per segment*
    (per graph), not over the whole batch.

    The reference calls its compressor (which contains ``nn.BatchNorm1d``)
    inside the per-graph compression loop (models.py:642 via 595-604), so in
    train mode each graph is normalized by its own node statistics.  This
    module reproduces that.  Running stats are updated once per step with the
    average of the per-segment statistics (the reference updates sequentially
    per graph — order-dependent; averaging is the batch-order-free
    equivalent, documented deviation).
    """

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 segment_ids: jnp.ndarray,
                 num_segments: int,
                 mask: Optional[jnp.ndarray] = None,
                 train: bool = True) -> jnp.ndarray:
        from ..ops.segment import (segment_broadcast, segment_count,
                                   segment_mean, segment_sum)

        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        if train:
            mean_g = segment_mean(x, segment_ids, num_segments, mask)
            mean = segment_broadcast(mean_g, segment_ids, num_segments)
            centered = x - mean
            count = segment_count(segment_ids, num_segments, mask)
            var_g = segment_sum(centered * centered, segment_ids,
                                num_segments, mask)
            var_g = var_g / jnp.maximum(count, 1.0)[:, None]  # biased (norm)
            var = segment_broadcast(var_g, segment_ids, num_segments)
            if not self.is_initializing():
                seg_mask = count > 0
                n_seg = jnp.maximum(jnp.sum(seg_mask.astype(jnp.float32)),
                                    1.0)
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


class MLP2(nn.Module):
    """``Linear -> ReLU -> Linear`` (reference ``MLP``, models.py:38-49)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        return nn.Dense(self.out)(x)


class MLPReadout(nn.Module):
    """Halving-width readout MLP: L layers each ``Linear(d/2^l -> d/2^(l+1))``
    with ReLU, then a final linear to ``out`` (reference models.py:961-978).
    Unused by the live S-CGIB paths; kept for API completeness."""

    out: int
    L: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        for l in range(self.L):
            x = nn.Dense(d // (2 ** (l + 1)), name=f"fc{l}")(x)
            x = nn.relu(x)
        return nn.Dense(self.out, name="out")(x)


class ReconstructX(nn.Module):
    """Feature decoder ``d -> d -> in_dim`` with ReLU (reference
    ``Reconstruct_X``, models.py:785-796/924-937)."""

    hidden: int
    in_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.in_dim, name="fc2")(x)


class MLPA(nn.Module):
    """Inner-product adjacency decoder: sigmoid(Z Z^T) after an MLP
    (reference ``MLP_A``, models.py:940-956)."""

    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden, name="fc2")(x)
        return jax.nn.sigmoid(x @ x.T)
