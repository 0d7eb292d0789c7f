"""Training machinery: optimizer, train state, jitted step functions, and
the parameter-freezing masks of the fine-tuning stage.

Replaces the reference's per-dataset ``train_*.py`` epoch loops
(train_moleculenetBACE.py:112-176, exp_pretraining.py:290-330) with one
model-agnostic, jit-compiled step API:

  * ``adam_l2``             — torch-style Adam with L2-in-gradient weight
                              decay (the reference uses ``torch.optim.Adam``
                              with ``weight_decay``, which adds wd*param to
                              the gradient *before* the Adam moments —
                              unlike AdamW).  Pretrain lr 1e-4 / wd 5e-5
                              (exp_pretraining.py:86), fine-tune lr 1e-3 /
                              wd 1e-5 (exp_moleculenetBACE_BBBP.py:157).
  * ``TrainState``          — params + batch_stats + opt state pytree.
  * ``make_pretrain_step``  — jitted (state, g, sub, rng) -> (state, losses).
  * ``make_finetune_step``  — jitted supervised step with a choice of loss
                              (bce | bce_logits | ce | rmse | mae) and a
                              trainable-parameter mask.
  * ``finetune_trainable_mask`` — which pretrained-core params stay
                              trainable, replicating models.py:424-434.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..graph.container import GraphBatch, SubgraphBatch
from ..models.losses import (bce_loss, bce_with_logits_loss,
                             cross_entropy_loss, mae_loss, rmse_loss)



def _model_rngs(rng):
    """RNG streams for model.apply: 'noise' (compression gate + feature
    noise) always; 'dropout' derived for encoders that use flax Dropout
    (the graph transformer, reference models.py:860) — flax ignores
    streams a module does not request.

    SCGIB_DROPOUT_RBG=1 (opt-in, read once — utils/knobs.py): hand the
    dropout stream an ``rbg`` key, lowering mask generation to XLA's
    RngBitGenerator instead of ~10 threefry rounds per block.  Dropout
    only gates the graph transformer's FFN (reference dropout=0.5), so
    this changes WHICH units drop, never the distribution.  Default ON
    since round 5 — measured 4015 -> 3352 us/step on the Transformer
    pretrain step (v5e-1, threefry masks were ~660 us across the 10
    layer instances); SCGIB_DROPOUT_RBG=0 restores threefry masks
    (bit-reproducible with rounds 1-4).  Runs are equally deterministic
    either way (same key -> same rbg bits)."""
    import jax as _jax

    from ..utils.knobs import env_flag

    dropout = _jax.random.fold_in(rng, 0x5eed)
    if env_flag("SCGIB_DROPOUT_RBG", "1"):
        data = _jax.random.bits(dropout, (4,), "uint32")
        dropout = _jax.random.wrap_key_data(data, impl="rbg")
    return {"noise": rng, "dropout": dropout}

def init_model(model, rngs, *args, **kwargs):
    """``model.init`` under jit.

    Un-jitted flax init executes the forward op-by-op; on a remote/tunneled
    device every one of those dispatches pays the link round trip (~25 ms
    each — measured ~2 minutes of wall for one PretrainModel init through
    the axon tunnel).  Jitted, it is one compile + one dispatch."""
    return jax.jit(model.init, static_argnames=("train",))(
        rngs, *args, **kwargs)


def adam_l2(learning_rate: float, weight_decay: float = 0.0,
            b1: float = 0.9, b2: float = 0.999,
            eps: float = 1e-8,
            flatten: bool = True) -> optax.GradientTransformation:
    """torch.optim.Adam(weight_decay=wd) semantics: grad += wd * param is
    applied before the Adam moment updates (NOT decoupled AdamW).

    ``flatten`` (default): run the update on ONE concatenated vector
    (optax.flatten).  Per-leaf Adam lowers to ~5 small fusions for each
    of the model's ~40 parameter tensors — pure dispatch-latency tail on
    TPU (the round-4 profile's "5-20 us fusions"); flattened it is a
    handful of [P]-sized ops.  Elementwise math, so numerics are
    IDENTICAL either way (test_adam_l2_matches_torch_adam runs both)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale(-learning_rate))
    tx = optax.chain(*parts)
    return _flatten_resident_params(tx) if flatten else tx


def _flatten_resident_params(
        tx: optax.GradientTransformation) -> optax.GradientTransformation:
    """``optax.flatten`` with the flat PARAMS vector carried in the
    optimizer state instead of re-concatenated every step.

    The round-5 GT trace showed the per-step flatten concats cost
    ~127 us at 135 leaves (one for grads, one for params — the params
    one feeds the L2 term).  The grads concat is unavoidable (autodiff
    yields per-leaf cotangents), but the params vector can be carried:
    ``apply_updates`` is an elementwise per-leaf add and the flat update
    is its exact concatenation, so ``p_flat + u_flat`` stays
    bit-identical to ``flatten(params + u)`` forever.  Requires that
    params are never mutated OUTSIDE apply_updates after ``tx.init``
    (true for every loop in train/; re-init the state after grafting or
    loading params, which checkpoint.py's flows already do)."""
    def _flat(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return jnp.concatenate([jnp.ravel(x) for x in leaves])

    def _unflat(vec, template):
        leaves, treedef = jax.tree_util.tree_flatten(template)
        out, i = [], 0
        for leaf in leaves:
            n = leaf.size
            out.append(jnp.reshape(vec[i:i + n], leaf.shape)
                       .astype(leaf.dtype))
            i += n
        return jax.tree_util.tree_unflatten(treedef, out)

    def init(params):
        if not jax.tree_util.tree_leaves(params):
            return (tx.init(params), None)
        p_flat = _flat(params)
        return (tx.init(p_flat), p_flat)

    def update(updates, state, params=None):
        inner_state, p_flat = state
        if p_flat is None:      # empty tree: passthrough
            new_inner, _ = tx.update(updates, inner_state, params)
            return updates, (new_inner, None)
        g_flat = _flat(updates)
        u_flat, new_inner = tx.update(g_flat, inner_state, p_flat)
        return (_unflat(u_flat, updates),
                (new_inner, p_flat + u_flat))

    return optax.GradientTransformation(init, update)


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation):
        params = variables["params"]
        return cls(params=params,
                   batch_stats=variables.get("batch_stats", FrozenDict()),
                   opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_pretrain_step(model, tx: optax.GradientTransformation,
                       donate: bool = True,
                       remat: bool = False) -> Callable:
    """Jitted self-supervised step: total = KL + contrastive + recon
    (exp_pretraining.py:321) -> grads -> Adam update.

    ``remat=True`` wraps the forward in ``jax.checkpoint`` so the
    backward recomputes activations instead of storing them — trades
    ~1/3 more FLOPs for O(layers) less HBM, for big-graph batches
    (peptides k>=3) that would otherwise not fit."""

    def loss_fn(params, batch_stats, g, sub, rng):
        losses, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            g, sub, train=True, mutable=["batch_stats"],
            rngs=_model_rngs(rng))
        return losses.total, (losses, mutated["batch_stats"])

    if remat:
        loss_fn = jax.checkpoint(loss_fn)

    def step(state: TrainState, g: GraphBatch, sub: SubgraphBatch,
             rng) -> Tuple[TrainState, Any]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (losses, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, g, sub, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(params=new_params, batch_stats=new_bs,
                          opt_state=new_opt, step=state.step + 1), losses

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_pretrain_scan_step(model, tx: optax.GradientTransformation,
                            n_inner: int,
                            donate: bool = True,
                            remat: bool = False) -> Callable:
    """``n_inner`` pretraining steps fused into one jitted ``lax.scan`` —
    one device dispatch per n_inner optimizer updates.  The production
    inner-loop pattern (and the only way to measure chip throughput when
    the host<->device link dominates single-step latency).  The same batch
    is reused across inner steps with a fresh RNG fold each step; pair
    with an outer loop feeding new batches.

    ``remat=True`` wraps the forward in ``jax.checkpoint`` (see
    make_pretrain_step) — needed for peptides-scale ego-net batches
    (k>=3, bench_peptides.py)."""

    def loss_fn(params, batch_stats, g, sub, rng):
        def fwd(params, batch_stats):
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                g, sub, train=True, mutable=["batch_stats"],
                rngs=_model_rngs(rng))

        if remat:
            fwd = jax.checkpoint(fwd)
        losses, mutated = fwd(params, batch_stats)
        return losses.total, (losses, mutated["batch_stats"])

    def step(state: TrainState, g: GraphBatch, sub: SubgraphBatch, rng):
        def body(carry, i):
            st = carry
            k = jax.random.fold_in(rng, i)
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, (losses, new_bs)), grads = grad_fn(
                st.params, st.batch_stats, g, sub, k)
            updates, new_opt = tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            return TrainState(params=new_params, batch_stats=new_bs,
                              opt_state=new_opt, step=st.step + 1), losses

        state, losses = jax.lax.scan(body, state, jnp.arange(n_inner))
        return state, losses  # losses stacked [n_inner]

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_pretrain_superbatch_step(model, tx: optax.GradientTransformation,
                                  donate: bool = True,
                                  wire: bool = False,
                                  byte_specs=None,
                                  byte_spec=None) -> Callable:
    """One optimizer step per batch, scanned over a SUPERBATCH — stacked
    (GraphBatch, SubgraphBatch) pytrees with a leading [K] axis.

    The host packs K batches, stacks the leaves, and ships ONE transfer +
    ONE dispatch for K real training steps — this amortizes the
    host<->device round-trip latency that dominates per-step cost on a
    tunneled/remote accelerator (measured 19 ms/batch single-step vs
    ~5 ms/batch with K=16 on v5e over axon).  Unlike
    ``make_pretrain_scan_step``, every inner step sees FRESH data, so this
    is the production epoch loop, not just a throughput probe.

    ``wire=True``: batches arrive in the compact wire format
    (graph/wire.py — int16 indices, count-scalars instead of masks, int8
    categorical features) and are reconstituted on device inside the
    scan body; measured ~2.6x less host->device traffic per batch.

    ``byte_specs=(g_spec, sub_spec)``: the stacked wire pytrees arrive
    as TWO single uint8 buffers (wire.pack_bytes) — one device transfer
    each instead of one per leaf, which removes the per-put round-trip
    latency that dominates on remote links.  Implies ``wire`` handling
    of the unpacked leaves.

    ``byte_spec`` (single ByteSpec over the combined ``(gs, subs)``
    pytree): the whole superbatch arrives as ONE uint8 buffer — one
    device transfer AND one transfer round trip per superbatch; the step
    signature becomes ``(state, buf, rng)``."""

    def loss_fn(params, batch_stats, g, sub, rng):
        losses, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            g, sub, train=True, mutable=["batch_stats"],
            rngs=_model_rngs(rng))
        return losses.total, (losses, mutated["batch_stats"])

    def run(state: TrainState, gs, subs, rng):
        def body(carry, batch):
            st, i = carry
            g, sub = batch
            if wire or byte_specs is not None or byte_spec is not None:
                from ..graph.wire import from_wire_graph, from_wire_sub

                g = from_wire_graph(g)
                sub = from_wire_sub(sub)
            k = jax.random.fold_in(rng, i)
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, (losses, new_bs)), grads = grad_fn(
                st.params, st.batch_stats, g, sub, k)
            updates, new_opt = tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            return (TrainState(params=new_params, batch_stats=new_bs,
                               opt_state=new_opt, step=st.step + 1),
                    i + 1), losses

        (state, _), losses = jax.lax.scan(
            body, (state, jnp.int32(0)), (gs, subs))
        return state, losses  # losses stacked [K]

    if byte_spec is not None:
        from ..graph.wire import unpack_bytes

        def step(state: TrainState, buf, rng):
            gs, subs = unpack_bytes(buf, byte_spec)
            return run(state, gs, subs, rng)
    elif byte_specs is not None:
        from ..graph.wire import unpack_bytes

        def step(state: TrainState, gbuf, sbuf, rng):
            gs = unpack_bytes(gbuf, byte_specs[0])
            subs = unpack_bytes(sbuf, byte_specs[1])
            return run(state, gs, subs, rng)
    else:
        step = run

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def stack_pytrees(items):
    """np.stack the leaves of a list of identically-shaped pytrees —
    host-side superbatch assembly (None leaves must agree)."""
    import numpy as np

    first = items[0]
    return jax.tree.map(
        lambda *xs: None if xs[0] is None else np.stack(xs), *items,
        is_leaf=lambda x: x is None)


_FINETUNE_LOSSES = {
    "bce": lambda scores, y, m: bce_loss(scores, y, m),
    "bce_logits": lambda scores, y, m: bce_with_logits_loss(scores, y, m),
    "ce": lambda scores, y, m: cross_entropy_loss(
        scores, y[:, 0], m[:, 0] if m is not None else None),
    "rmse": lambda scores, y, m: rmse_loss(scores, y, m),
    "mae": lambda scores, y, m: mae_loss(scores, y, m),
}


def make_finetune_step(model, tx: optax.GradientTransformation,
                       loss_type: str = "bce",
                       grad_accum: int = 1,
                       donate: bool = True) -> Callable:
    """Jitted supervised fine-tune step.  ``loss_type`` mirrors the
    per-dataset loss table (SURVEY.md §2.2).  Labels/masks come from the
    GraphBatch; padded graphs are masked out of the loss.

    ``grad_accum`` > 1 reproduces the reference's gradient accumulation
    (peptides-func accumulates 2 batches before stepping,
    train_pep_func.py:165-173): the step takes stacked batches with a
    leading accumulation axis, averages the gradients, and applies one
    update."""
    if loss_type not in _FINETUNE_LOSSES:
        raise ValueError(f"unknown loss {loss_type!r}; "
                         f"one of {sorted(_FINETUNE_LOSSES)}")
    loss_impl = _FINETUNE_LOSSES[loss_type]

    def loss_fn(params, batch_stats, g, sub, rng):
        scores, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            g, sub, train=True, mutable=["batch_stats"],
            rngs=_model_rngs(rng))
        mask = g.label_mask
        if mask is not None:
            mask = mask & g.graph_mask[:, None]
        else:
            mask = jnp.broadcast_to(g.graph_mask[:, None], g.labels.shape)
        loss = loss_impl(scores, g.labels, mask)
        return loss, (loss, mutated["batch_stats"])

    def step(state: TrainState, g: GraphBatch, sub: SubgraphBatch,
             rng) -> Tuple[TrainState, jnp.ndarray]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if grad_accum == 1:
            (_, (loss, new_bs)), grads = grad_fn(
                state.params, state.batch_stats, g, sub, rng)
        else:
            def acc_body(carry, inputs):
                grads_sum, loss_sum, bs = carry
                g_i, sub_i, rng_i = inputs
                (_, (loss_i, bs)), grads_i = grad_fn(
                    state.params, bs, g_i, sub_i, rng_i)
                grads_sum = jax.tree_util.tree_map(
                    lambda a, b: a + b, grads_sum, grads_i)
                return (grads_sum, loss_sum + loss_i, bs), None

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            rngs = jax.random.split(rng, grad_accum)
            (grads, loss, new_bs), _ = jax.lax.scan(
                acc_body, (zero, jnp.asarray(0.0), state.batch_stats),
                (g, sub, rngs))
            grads = jax.tree_util.tree_map(lambda a: a / grad_accum, grads)
            loss = loss / grad_accum
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(params=new_params, batch_stats=new_bs,
                          opt_state=new_opt, step=state.step + 1), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_domainadapt_step(model, tx: optax.GradientTransformation,
                          donate: bool = True) -> Callable:
    """Jitted domain-adaptation step: the model's forward IS the scalar
    loss (unnormalized squared readout-reconstruction error,
    models.py:276-281)."""

    def loss_fn(params, batch_stats, g, sub, rng):
        loss, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            g, sub, train=True, mutable=["batch_stats"],
            rngs=_model_rngs(rng))
        return loss, (loss, mutated["batch_stats"])

    def step(state: TrainState, g: GraphBatch, sub: SubgraphBatch,
             rng) -> Tuple[TrainState, jnp.ndarray]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (loss, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, g, sub, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(params=new_params, batch_stats=new_bs,
                          opt_state=new_opt, step=state.step + 1), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_fn(model, live_noise: bool = False) -> Callable:
    """Jitted inference: (variables, g, sub, rng) -> scores.

    ``live_noise=False`` (default): eval mode — running BN statistics,
    fixed caller-controlled rng through the (always-on) gate noise, so
    repeated evaluations of one checkpoint are reproducible.

    ``live_noise=True``: the REFERENCE's evaluation semantics — its
    ``evaluate_network`` never calls ``model.eval()`` and never switches
    the compression gate off (train_moleculenetBACE.py:112-176), so
    batch statistics and fresh noise stay live at eval; the mutated
    batch_stats are discarded here (the reference's running stats do
    drift during eval — a side effect no metric reads).  The measured
    deviation between the two modes is quantified in
    tests/test_eval_noise.py and documented in PARITY.md."""

    if live_noise:
        @jax.jit
        def run(variables, g: GraphBatch, sub: SubgraphBatch, rng):
            scores, _ = model.apply(variables, g, sub, train=True,
                                    mutable=["batch_stats"],
                                    rngs=_model_rngs(rng))
            return scores

        return run

    @jax.jit
    def run(variables, g: GraphBatch, sub: SubgraphBatch, rng):
        return model.apply(variables, g, sub, train=False,
                           rngs=_model_rngs(rng))

    return run


def finetune_trainable_mask(params, mode: str = "reference"):
    """Boolean pytree: True = trainable.  The reference freezes the whole
    pretrained module then name-match-unfreezes encoder layers
    (models.py:424-434).  Because the inner loop's ``else`` re-freezes on
    every non-match and 'layers.2' is checked last, ONLY conv index 2 of
    each encoder ends up trainable ('layers.4' matches nothing in a 4-conv
    stack, 'layers.3' is unfrozen then immediately re-frozen by the
    'layers.2' comparison).  Fresh head params (everything outside ``core``'s
    encoders/compressor/attn) are always trainable.

    mode='reference'  — only encoder conv2 (+bn2) of the pretrained core.
    mode='paper'      — encoder convs/bns 2 and 3 (the loop's evident
                        intent: the top layers of a 4-conv stack).
    mode='all'        — whole core trainable.
    mode='frozen'     — core fully frozen.
    """
    if mode not in ("reference", "paper", "all", "frozen"):
        raise ValueError(f"unknown freeze mode {mode!r}")

    def decide(path) -> bool:
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        if "core" not in keys:
            return True          # fresh heads always train
        if mode == "all":
            return True
        if mode == "frozen":
            return False
        in_encoder = any(k in ("encoder1", "encoder2") for k in keys)
        if not in_encoder:
            return False         # pretrained compressor / attn stay frozen
        wanted = ("conv2", "bn2") if mode == "reference" else (
            "conv2", "bn2", "conv3", "bn3")
        return any(k in wanted for k in keys)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [decide(path) for path, _ in flat])


def masked_tx(tx: optax.GradientTransformation,
              trainable_mask) -> optax.GradientTransformation:
    """Apply ``tx`` only where the mask is True; frozen params get zero
    updates (the analog of requires_grad=False)."""
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        jax.tree_util.tree_map(
            lambda t: "train" if t else "freeze", trainable_mask))
