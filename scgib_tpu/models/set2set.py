"""Set2Set global pooling (Vinyals et al.) — replacement for DGL's
``Set2Set(hidden, n_iters=2, n_layers=1)`` used by the reference for graph
readout and fine-tune heads (models.py:565, 515).

Algorithm per batch of graphs (segment ids over nodes):
  q_star = 0 (shape [G, 2d]);  (h, c) = 0
  repeat n_iters times:
      q, (h, c) = LSTM(q_star, (h, c))              # input 2d -> hidden d
      e_v   = <x_v, q_{g(v)}>                        # per node
      a_v   = softmax over nodes within graph
      r_g   = sum_v a_v x_v
      q_star = concat([q, r], -1)
  return q_star  (shape [G, 2d])
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.segment import (segment_broadcast, segment_softmax,
                           segment_sum)


class Set2Set(nn.Module):
    hidden: int
    n_iters: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, segment_ids: jnp.ndarray,
                 num_segments: int,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        d = self.hidden
        cell = nn.OptimizedLSTMCell(d, name="lstm")
        g = num_segments
        q_star = jnp.zeros((g, 2 * d), dtype=x.dtype)
        carry = (jnp.zeros((g, d), dtype=x.dtype),
                 jnp.zeros((g, d), dtype=x.dtype))
        for _ in range(self.n_iters):
            carry, q = cell(carry, q_star)
            e = jnp.sum(x * segment_broadcast(q, segment_ids, g),
                        axis=-1)
            a = segment_softmax(e, segment_ids, g, mask=mask)
            r = segment_sum(x * a[:, None], segment_ids, g, mask=mask)
            q_star = jnp.concatenate([q, r], axis=-1)
        return q_star
