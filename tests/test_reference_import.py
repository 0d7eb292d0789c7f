"""Reference checkpoint import: unpickle the shipped whole-module torch
artifact (outputs/pre_training_v1_GIN_64_5_1.pt) without DGL, verify the
curriculum-nesting finding, convert into our pytree, and run a forward."""

import os

import numpy as np
import jax
import pytest

REF_CP = "/root/reference/outputs/pre_training_v1_GIN_64_5_1.pt"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_CP),
                                reason="reference artifact not present")


@pytest.fixture(scope="module")
def flat():
    from scgib_tpu.utils.reference_import import load_reference_state

    return load_reference_state(REF_CP)


def test_nesting_structure(flat):
    """Stage-3 checkpoint = Mainmodel_continue^3 wrapping the init
    Mainmodel: 3 'model.' levels."""
    from scgib_tpu.utils.reference_import import (bn_trained_at_depth,
                                                  nesting_depths,
                                                  trained_core_depth)

    assert nesting_depths(flat) == 3
    # The outermost encoders were NEVER run (their forward delegates to
    # the wrapped model, models.py:1167): BN running stats still (0, 1).
    assert not bn_trained_at_depth(flat, 0)
    assert bn_trained_at_depth(flat, 1)
    assert trained_core_depth(flat) == 1


def test_artifact_has_five_convs(flat):
    """The shipped artifact was trained with 5 GIN convs per encoder,
    although the released GIN class builds only 4 (models.py:57-64)."""
    assert "model.Encoder1.ginlayers.4.apply_func.mlp.0.weight" in flat
    assert "model.Encoder1.ginlayers.5.apply_func.mlp.0.weight" not in flat


def test_convert_and_forward(flat):
    from scgib_tpu.data.synthetic import random_dataset
    from scgib_tpu.graph.batching import pack_graphs, pack_subgraphs
    from scgib_tpu.graph.egonet import extract_egonets
    from scgib_tpu.models.scgib import PretrainModel
    from scgib_tpu.utils.reference_import import \
        convert_to_pretrain_variables

    variables, meta = convert_to_pretrain_variables(flat)
    assert meta["core_depth"] == 1
    assert meta["num_convs"] == 5
    assert variables["params"]["transfer_d"]["kernel"].shape == (9, 32)

    graphs = random_dataset(4, seed=0, min_nodes=6, max_nodes=12,
                            feat_dim=9)
    egos = [extract_egonets(g, 1) for g in graphs]
    g = pack_graphs(graphs, 64, 256, 4)
    sub = pack_subgraphs(graphs, egos, 256, 1024)

    model = PretrainModel(in_dim=9, hidden=64, d_transfer=32,
                          num_layers=meta["num_convs"])
    # structural compatibility: converted tree must match a fresh init
    ref_vars = model.init({"params": jax.random.PRNGKey(0),
                           "noise": jax.random.PRNGKey(1)}, g, sub,
                          train=True)
    ref_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(ref_vars)[0]}
    got_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(variables)[0]}
    assert ref_paths == got_paths

    losses = model.apply(variables, g, sub, train=False,
                         rngs={"noise": jax.random.PRNGKey(2)})
    assert np.isfinite(float(losses.total))
    # trained weights: eval-mode forward should not explode
    assert float(losses.total) < 1e4
