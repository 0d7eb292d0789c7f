"""TUDataset raw-text reader: round-trip a synthesized dataset written in
the published format."""

import os

import numpy as np
import pytest

from scgib_tpu.data.tudataset import load_tudataset


@pytest.fixture
def tiny_tu(tmp_path):
    """Two graphs: a triangle (label 1) and a 2-path (label -1), with
    node labels {0,1,2} and one float attribute."""
    d = tmp_path / "TINY"
    d.mkdir()
    # global node ids 1..5: graph 1 = {1,2,3}, graph 2 = {4,5}
    (d / "TINY_A.txt").write_text(
        "1, 2\n2, 1\n2, 3\n3, 2\n1, 3\n3, 1\n4, 5\n5, 4\n")
    (d / "TINY_graph_indicator.txt").write_text("1\n1\n1\n2\n2\n")
    (d / "TINY_graph_labels.txt").write_text("1\n-1\n")
    (d / "TINY_node_labels.txt").write_text("0\n1\n2\n1\n0\n")
    (d / "TINY_node_attributes.txt").write_text(
        "0.5\n1.5\n2.5\n3.5\n4.5\n")
    return str(tmp_path)


def test_load_tudataset(tiny_tu):
    graphs = load_tudataset(tiny_tu, "TINY")
    assert len(graphs) == 2
    g1, g2 = graphs
    assert g1.num_nodes == 3 and g2.num_nodes == 2
    assert g1.num_edges == 6          # triangle, both directions
    assert g2.num_edges == 2
    # features: one-hot(3 classes) ++ attribute
    assert g1.node_feat.shape == (3, 4)
    np.testing.assert_allclose(g1.node_feat[0], [1, 0, 0, 0.5])
    np.testing.assert_allclose(g1.node_feat[2], [0, 0, 1, 2.5])
    np.testing.assert_allclose(g2.node_feat[1], [1, 0, 0, 4.5])
    # labels mapped to 0-based classes: -1 -> 0, 1 -> 1
    assert g1.label[0] == 1.0
    assert g2.label[0] == 0.0
    # local, symmetric edges
    assert g2.senders.max() < 2


def test_load_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_tudataset(str(tmp_path), "NOPE")
