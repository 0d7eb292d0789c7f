"""Data-parallel training over a JAX device mesh.

The reference has no distributed training at all (SURVEY.md §2.5 — no
torch.distributed anywhere; live paths are single-GPU).  This module is the
TPU-native scale-out design: per-device packed graph batches sharded over a
``('data',)`` mesh axis via ``shard_map``, gradients reduced with ``psum``
over ICI, and the contrastive loss's batch-global denominator preserved by
all-gathering graph readouts across shards (losses.py axis_name support).

Layout:
  * params / opt state — replicated (the model is ~1M params).
  * batches — one ``GraphBatch``/``SubgraphBatch`` per device, stacked on a
    leading mesh axis (``stack_batches``) and sharded ``P('data')``.
  * collectives — ``psum`` for gradient/loss reduction, ``all_gather`` for
    the InfoNCE denominator; XLA overlaps them with the backward pass.

The same step function runs on a v5e pod slice or on the 8-device virtual
CPU mesh used in tests (conftest.py).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..graph.container import GraphBatch, SubgraphBatch
from ..train.trainer import TrainState

DATA_AXIS = "data"



def _model_rngs(rng):
    """RNG streams for model.apply: 'noise' (compression gate + feature
    noise) always; 'dropout' derived for encoders that use flax Dropout
    (the graph transformer, reference models.py:860) — flax ignores
    streams a module does not request."""
    import jax as _jax

    return {"noise": rng, "dropout": _jax.random.fold_in(rng, 0x5eed)}

def make_mesh(devices: Sequence[jax.Device] | None = None,
              axis: str = DATA_AXIS) -> Mesh:
    """1-D data mesh over all (or the given) devices."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis,))


def stack_batches(batches: Sequence[Any]) -> Any:
    """Stack per-device pytrees (e.g. GraphBatch) on a new leading axis so
    the result can be sharded ``P('data')`` across the mesh."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *batches)


def stack_batches_host(batches: Sequence[Any]) -> Any:
    """Stack host-resident (NumPy) pytrees on the HOST, producing one
    contiguous array per leaf — so the subsequent device transfer is one
    put per leaf instead of one per (leaf, batch).  Over a tunneled/
    remote accelerator the per-transfer latency dominates: K=16
    superbatches measured ~5x faster to ship this way than via
    ``stack_batches`` (bench.py sustained path)."""
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches)
    return jax.device_put(stacked)


def shard_batch(mesh: Mesh, stacked: Any) -> Any:
    """Device_put a stacked batch with its leading axis over the mesh."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, stacked)


def _squeeze_leading(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: x[0], tree)


def make_dp_pretrain_step(model, tx: optax.GradientTransformation,
                          mesh: Mesh, donate: bool = True) -> Callable:
    """Data-parallel pretraining step via shard_map.

    ``model`` must be constructed with ``axis_name=DATA_AXIS`` so its losses
    reduce globally; the returned scalar losses equal the single-device
    values over the union batch.  Signature:
    (state, stacked_g, stacked_sub, rng[D]) -> (state, losses).
    """

    def shard_step(state: TrainState, g: GraphBatch, sub: SubgraphBatch,
                   rng):
        g = _squeeze_leading(g)
        sub = _squeeze_leading(sub)
        rng = rng[0]

        def loss_fn(params, batch_stats):
            losses, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                g, sub, train=True, mutable=["batch_stats"],
                rngs=_model_rngs(rng))
            return losses.total, (losses, mutated["batch_stats"])

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (losses, new_bs)), grads = grad_fn(state.params,
                                               state.batch_stats)
        # the model returns per-shard losses (local numerator / global
        # denominator): psum of the grads is the exact gradient of the
        # global loss, and psum of the loss values is the global loss.
        grads = jax.lax.psum(grads, DATA_AXIS)
        losses = jax.lax.psum(losses, DATA_AXIS)
        # BatchNorm running stats: average the per-shard updates so the
        # replicated state stays identical on every device.
        new_bs = jax.lax.pmean(new_bs, DATA_AXIS)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, batch_stats=new_bs,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, losses

    sharded = shard_map(
        shard_step, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_dp_finetune_step(model, tx: optax.GradientTransformation,
                          mesh: Mesh, loss_impl: Callable,
                          donate: bool = True) -> Callable:
    """Data-parallel supervised step; ``loss_impl(scores, labels, mask)``
    returns the local (sum, count) pair for a psum-mean global loss."""

    def shard_step(state: TrainState, g: GraphBatch, sub: SubgraphBatch,
                   rng):
        g = _squeeze_leading(g)
        sub = _squeeze_leading(sub)
        rng = rng[0]

        def loss_fn(params, batch_stats):
            scores, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                g, sub, train=True, mutable=["batch_stats"],
                rngs=_model_rngs(rng))
            mask = g.label_mask
            if mask is not None:
                mask = mask & g.graph_mask[:, None]
            else:
                mask = jnp.broadcast_to(g.graph_mask[:, None],
                                        g.labels.shape)
            total, count = loss_impl(scores, g.labels, mask)
            # local numerator / global denominator (see losses.py note on
            # grad-correct shard_map losses); global value psum'd after grad
            count = jax.lax.psum(count, DATA_AXIS)
            loss = total / jnp.maximum(count, 1.0)
            return loss, (loss, mutated["batch_stats"])

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (loss, new_bs)), grads = grad_fn(state.params, state.batch_stats)
        grads = jax.lax.psum(grads, DATA_AXIS)
        loss = jax.lax.psum(loss, DATA_AXIS)
        new_bs = jax.lax.pmean(new_bs, DATA_AXIS)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, batch_stats=new_bs,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, loss

    sharded = shard_map(
        shard_step, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def bce_sum_count(scores, labels, mask):
    """(sum, count) form of BCE for make_dp_finetune_step.  Log outputs
    clamped at -100 like torch nn.BCELoss (see losses.bce_loss: clipping
    p is a float32 no-op at sigmoid saturation and yields 0 * -inf)."""
    from ..models.losses import _safe_log

    labels = jnp.where(jnp.isnan(labels), 0.0, labels)
    ll = -(labels * _safe_log(scores)
           + (1.0 - labels) * _safe_log(1.0 - scores))
    m = mask.astype(ll.dtype)
    return jnp.sum(ll * m), jnp.sum(m)


def make_dp_superbatch_step(model, tx: optax.GradientTransformation,
                            mesh: Mesh, byte_spec,
                            donate: bool = True) -> Callable:
    """Data-parallel SUPERBATCH step: the production wire transport
    (graph/wire.py single-uint8-buffer encoding) lifted to the mesh.

    Each shard receives its own combined uint8 buffer of K wire batches
    (stacked ``[D, nbytes]``, sharded ``P('data')``); on device every
    shard unpacks its buffer and the mesh scans K REAL optimizer steps —
    grads/losses psum'd per inner step, BatchNorm running stats pmean'd,
    exactly like ``make_dp_pretrain_step`` — so D*K batches are consumed
    per dispatch with one transfer per shard.  Signature:
    ``(state, bufs[D, nbytes], rng[D]) -> (state, losses[K])``.

    ``model`` must be built with ``axis_name=DATA_AXIS`` (sync-BN +
    global InfoNCE denominator).  ``byte_spec`` is the per-shard
    ByteSpec from ``loader.superbatch_spec``.
    """
    from ..graph.wire import (from_wire_graph, from_wire_sub,
                              unpack_bytes)

    def shard_step(state: TrainState, buf, rng):
        buf = buf[0]
        rng = rng[0]
        gs, subs = unpack_bytes(buf, byte_spec)

        def loss_fn(params, batch_stats, g, sub, k):
            losses, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                g, sub, train=True, mutable=["batch_stats"],
                rngs=_model_rngs(k))
            return losses.total, (losses, mutated["batch_stats"])

        def body(carry, batch):
            st, i = carry
            wg, wsub = batch
            g = from_wire_graph(wg)
            sub = from_wire_sub(wsub)
            k = jax.random.fold_in(rng, i)
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, (losses, new_bs)), grads = grad_fn(
                st.params, st.batch_stats, g, sub, k)
            grads = jax.lax.psum(grads, DATA_AXIS)
            losses = jax.lax.psum(losses, DATA_AXIS)
            new_bs = jax.lax.pmean(new_bs, DATA_AXIS)
            updates, new_opt = tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            return (TrainState(params=new_params, batch_stats=new_bs,
                               opt_state=new_opt, step=st.step + 1),
                    i + 1), losses

        (state, _), losses = jax.lax.scan(
            body, (state, jnp.int32(0)), (gs, subs))
        return state, losses

    sharded = shard_map(
        shard_step, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())
