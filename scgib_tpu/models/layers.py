"""Shared neural layers: masked BatchNorm and the 2-layer MLP.

Masked BatchNorm matters because our batches are padded: statistics must be
computed over *real* nodes only, otherwise padding would skew the mean/var
that the reference's ``nn.BatchNorm1d`` computes over the exact node set
(reference models.py:64, 591).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over rows with a validity mask.

    Matches torch ``nn.BatchNorm1d`` semantics: biased variance for the
    normalization, *unbiased* variance for the running stats, momentum 0.1,
    eps 1e-5, affine.
    """

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 train: bool = True) -> jnp.ndarray:
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        if train:
            if mask is None:
                count = jnp.asarray(x.shape[0], jnp.float32)
                mean = jnp.mean(x, axis=0)
                var = jnp.mean((x - mean) ** 2, axis=0)
            else:
                m = mask.astype(x.dtype)[:, None]
                count = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(x * m, axis=0) / count
                var = jnp.sum(((x - mean) ** 2) * m, axis=0) / count
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
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
