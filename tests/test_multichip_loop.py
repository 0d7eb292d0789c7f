"""Multi-chip TRAINING LOOP correctness (VERDICT r4 next 6): several DP
superbatch steps through the real wire transport on an 8-device mesh,
then a save / kill / resume cycle that must be bit-identical to an
uninterrupted run — the single-chip ``resume_determinism`` demonstration
lifted to the mesh.  (The reference has nothing here; SURVEY §7.1
step 8 is our north-star scope.)"""

import numpy as np
import jax

import pytest

from scgib_tpu.data.loader import (GraphDataset, plan_capacities,
                                   superbatch_spec, wire_superbatches)
from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.models.scgib import PretrainModel
from scgib_tpu.parallel.dp import (DATA_AXIS, make_dp_superbatch_step,
                                   make_mesh)
from scgib_tpu.train.checkpoint import load_train_state, save_train_state
from scgib_tpu.train.trainer import TrainState, adam_l2

D = 8          # mesh size
K = 3          # batches per shard superbatch
BATCH = 8
HID, DT = 16, 8


@pytest.fixture(scope="module")
def setup():
    devs = jax.devices()[:D]
    assert len(devs) == D
    mesh = make_mesh(devs)

    ds = GraphDataset(random_dataset(BATCH * K * D * 2, seed=5,
                                     min_nodes=6, max_nodes=14), k=1)
    caps = plan_capacities(ds, BATCH)
    spec = superbatch_spec(ds, BATCH, caps, K)

    model = PretrainModel(in_dim=9, hidden=HID, d_transfer=DT,
                          axis_name=DATA_AXIS)
    init_model = PretrainModel(in_dim=9, hidden=HID, d_transfer=DT)
    from scgib_tpu.data.loader import batch_iterator
    g0, sub0 = next(batch_iterator(ds, BATCH, caps, shuffle=False))
    variables = init_model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g0, sub0, train=True)
    tx = adam_l2(1e-3, weight_decay=5e-5)
    step = make_dp_superbatch_step(model, tx, mesh, spec, donate=False)
    return ds, caps, spec, variables, tx, step


def _shard_bufs(ds, caps, spec, seed):
    """One [D, nbytes] buffer: D shards x K wire batches each."""
    bufs = []
    for shard in range(D):
        it = wire_superbatches(ds, BATCH, caps, K, shuffle=True,
                               seed=seed * 100 + shard, byte_spec=spec)
        buf, _ = next(it)
        bufs.append(np.asarray(buf))
    return np.stack(bufs)


def _run(step, state, ds, caps, spec, steps, start=0):
    for i in range(start, start + steps):
        bufs = _shard_bufs(ds, caps, spec, seed=i)
        rngs = jax.random.split(jax.random.fold_in(
            jax.random.PRNGKey(7), i), D)
        state, losses = step(state, bufs, rngs)
        assert np.isfinite(np.asarray(losses)).all()
    return state


def test_dp_superbatch_multi_step_and_resume(setup, tmp_path):
    ds, caps, spec, variables, tx, step = setup
    path = str(tmp_path / "mesh_auto.msgpack")

    # uninterrupted: 4 superbatch steps (= 4*K*D = 96 real batches)
    state_a = _run(step, TrainState.create(variables, tx), ds, caps,
                   spec, steps=4)

    # interrupted: 2 steps, SAVE the (replicated) mesh state, "kill"
    state_b = _run(step, TrainState.create(variables, tx), ds, caps,
                   spec, steps=2)
    save_train_state(path, state_b, epoch=1, rng=jax.random.PRNGKey(0))
    del state_b

    # resume into a FRESH state object (new process analog), finish
    fresh = TrainState.create(variables, tx)
    state_c, epoch, _, _ = load_train_state(path, fresh)
    assert epoch == 1
    state_c = _run(step, state_c, ds, caps, spec, steps=2, start=2)

    for a, c in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_c.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    for a, c in zip(jax.tree_util.tree_leaves(state_a.opt_state),
                    jax.tree_util.tree_leaves(state_c.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    for a, c in zip(jax.tree_util.tree_leaves(state_a.batch_stats),
                    jax.tree_util.tree_leaves(state_c.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_dp_superbatch_consumes_union(setup):
    """The scanned DP step must advance step count by K and keep the
    state replicated across the mesh."""
    ds, caps, spec, variables, tx, step = setup
    state = TrainState.create(variables, tx)
    bufs = _shard_bufs(ds, caps, spec, seed=99)
    rngs = jax.random.split(jax.random.PRNGKey(3), D)
    state2, losses = step(state, bufs, rngs)
    assert int(state2.step) == int(state.step) + K
    assert np.asarray(losses).shape[0] == K
    # replicated output: fully-addressable single value per leaf
    for leaf in jax.tree_util.tree_leaves(state2.params):
        assert leaf.sharding.is_fully_replicated
