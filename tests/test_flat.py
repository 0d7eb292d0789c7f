"""FlatDataset packer (data/flat.py + native scgib_pack_batch) parity
with the per-graph Python packers — bit-identical arrays required."""

import numpy as np
import pytest

from scgib_tpu.data.flat import _pack_numpy, build_flat, pack_flat_batch
from scgib_tpu.data.loader import (GraphDataset, pack_batch, plan_batches,
                                   plan_capacities)
from scgib_tpu.data.synthetic import random_dataset


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    graphs = random_dataset(200, seed=0, min_nodes=5, max_nodes=30,
                            feat_dim=9)
    # attach multi-task labels with NaNs to exercise the label path
    import dataclasses

    labeled = []
    for i, g in enumerate(graphs):
        lab = rng.normal(size=3).astype(np.float32)
        if i % 4 == 0:
            lab[1] = np.nan
        labeled.append(dataclasses.replace(g, label=lab))
    ds = GraphDataset(labeled, k=1)
    caps = plan_capacities(ds, 48)
    plans = plan_batches(ds, 48, caps, shuffle=True, seed=7)
    return ds, build_flat(ds), caps, plans


def _assert_batch_equal(a, b):
    import jax

    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = jax.tree_util.tree_flatten_with_path(b)[0]
    assert len(fa) == len(fb)
    for (pa, la), (_, lb) in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=str(pa))


def test_flat_pack_matches_python_packers(setup):
    ds, fd, caps, plans = setup
    for sel in plans:
        g_ref, sub_ref = pack_batch(ds, sel, caps)
        g, sub = pack_flat_batch(fd, sel, caps)
        _assert_batch_equal(g, g_ref)
        _assert_batch_equal(sub, sub_ref)


def test_native_matches_numpy_fallback(setup):
    ds, fd, caps, plans = setup
    from scgib_tpu.native import have_native, pack_batch_native

    sel = np.asarray(plans[0])
    ref = _pack_numpy(fd, sel, caps)
    if not have_native():
        pytest.skip("native library unavailable")
    out = pack_batch_native(fd, sel, caps)
    assert out is not None
    for i, (a, b) in enumerate(zip(out, ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"field {i}")


def test_capacity_overflow_raises(setup):
    ds, fd, caps, plans = setup
    import dataclasses

    tiny = dataclasses.replace(caps, nodes=8)
    with pytest.raises(ValueError, match="capacit"):
        pack_flat_batch(fd, plans[0], tiny)


def test_flat_batches_train(setup):
    """Flat-packed batches drive the model identically to Python-packed
    ones (same loss on the same variables)."""
    import jax

    from scgib_tpu.models.scgib import PretrainModel

    ds, fd, caps, plans = setup
    g_ref, sub_ref = pack_batch(ds, plans[0], caps)
    g, sub = pack_flat_batch(fd, plans[0], caps)
    model = PretrainModel(in_dim=9, hidden=16, d_transfer=8)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "noise": jax.random.PRNGKey(1)}, g_ref, sub_ref,
                   train=True)
    l_ref = model.apply(v, g_ref, sub_ref, train=False,
                        rngs={"noise": jax.random.PRNGKey(2)})
    l = model.apply(v, g, sub, train=False,
                    rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(float(l.total), float(l_ref.total))
