"""Edge-partitioned SpMM across the virtual CPU mesh equals the
single-device aggregation on the union graph."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.batching import pack_graphs
from scgib_tpu.ops.spmm import gather_sum
from scgib_tpu.parallel.dp import make_mesh, shard_map
from scgib_tpu.parallel.edge_partition import (partition_edges,
                                               partition_edges_ring,
                                               partitioned_spmm,
                                               ring_partitioned_spmm)

N_SHARDS = 8


def test_partitioned_spmm_matches_single():
    graphs = random_dataset(16, seed=41, min_nodes=8, max_nodes=30)
    g = pack_graphs(graphs, 512, 2048, 16)

    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    m = np.asarray(g.edge_mask)
    part = partition_edges(s[m], r[m], g.num_nodes, N_SHARDS)

    rng = np.random.default_rng(0)
    h = rng.normal(size=(g.num_nodes, 32)).astype(np.float32)

    want = gather_sum(jnp.asarray(h), g.senders, g.receivers,
                      g.num_nodes, g.edge_mask)

    mesh = make_mesh(jax.devices()[:N_SHARDS])
    per = part.nodes_per_shard

    def shard_fn(h_loc, sg, rl, em):
        return partitioned_spmm(h_loc[0], sg[0], rl[0], em[0],
                                "data")[None]

    fn = jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data")),
        out_specs=P("data"), check_vma=False))
    h_stacked = h.reshape(N_SHARDS, per, 32)
    got = fn(jnp.asarray(h_stacked),
             jnp.asarray(part.senders_global),
             jnp.asarray(part.receivers_local),
             jnp.asarray(part.edge_mask))
    got = np.asarray(got).reshape(g.num_nodes, 32)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def _ring_reference(h, s, r, n):
    want = np.zeros_like(h)
    np.add.at(want, r, h[s])
    return want


def test_ring_partition_radius_one_for_contiguous_packing():
    """Contiguously packed molecular batches only have boundary-crossing
    edges between adjacent shards -> radius 1 (ship 2 blocks, not S-1)."""
    graphs = random_dataset(16, seed=7, min_nodes=8, max_nodes=30)
    g = pack_graphs(graphs, 512, 2048, 16)
    s = np.asarray(g.senders)[np.asarray(g.edge_mask)]
    r = np.asarray(g.receivers)[np.asarray(g.edge_mask)]
    plan = partition_edges_ring(s, r, g.num_nodes, N_SHARDS)
    assert plan.radius <= 1


def test_ring_partitioned_spmm_matches_single():
    rng = np.random.default_rng(3)
    n = 128
    d = 16
    # adversarial: random edges spanning the whole ring (radius ~ S/2)
    e = 700
    s = rng.integers(0, n, size=e).astype(np.int32)
    r = rng.integers(0, n, size=e).astype(np.int32)
    h = rng.normal(size=(n, d)).astype(np.float32)

    plan = partition_edges_ring(s, r, n, N_SHARDS)
    assert plan.radius >= 2        # actually exercises multi-hop rings

    want = _ring_reference(h, s, r, n)

    mesh = make_mesh(jax.devices()[:N_SHARDS])
    per = plan.nodes_per_shard

    def shard_fn(h_loc, sol, rl, em):
        return ring_partitioned_spmm(h_loc[0], sol[:, 0], rl[:, 0],
                                     em[:, 0], plan.radius, "data")[None]

    fn = jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data"), P(None, "data"), P(None, "data"),
                  P(None, "data")),
        out_specs=P("data"), check_vma=False))
    got = fn(jnp.asarray(h.reshape(N_SHARDS, per, d)),
             jnp.asarray(plan.senders_owner_local),
             jnp.asarray(plan.receivers_local),
             jnp.asarray(plan.edge_mask))
    np.testing.assert_allclose(np.asarray(got).reshape(n, d), want,
                               rtol=1e-5, atol=1e-5)


def test_ring_matches_allgather_partition_on_packed_batch():
    graphs = random_dataset(16, seed=41, min_nodes=8, max_nodes=30)
    g = pack_graphs(graphs, 512, 2048, 16)
    m = np.asarray(g.edge_mask)
    s = np.asarray(g.senders)[m]
    r = np.asarray(g.receivers)[m]
    plan = partition_edges_ring(s, r, g.num_nodes, N_SHARDS)

    rng = np.random.default_rng(1)
    h = rng.normal(size=(g.num_nodes, 8)).astype(np.float32)
    want = np.asarray(gather_sum(jnp.asarray(h), g.senders, g.receivers,
                                 g.num_nodes, g.edge_mask))

    mesh = make_mesh(jax.devices()[:N_SHARDS])
    per = plan.nodes_per_shard

    def shard_fn(h_loc, sol, rl, em):
        return ring_partitioned_spmm(h_loc[0], sol[:, 0], rl[:, 0],
                                     em[:, 0], plan.radius, "data")[None]

    fn = jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data"), P(None, "data"), P(None, "data"),
                  P(None, "data")),
        out_specs=P("data"), check_vma=False))
    got = fn(jnp.asarray(h.reshape(N_SHARDS, per, 8)),
             jnp.asarray(plan.senders_owner_local),
             jnp.asarray(plan.receivers_local),
             jnp.asarray(plan.edge_mask))
    np.testing.assert_allclose(np.asarray(got).reshape(g.num_nodes, 8),
                               want, rtol=1e-5, atol=1e-5)


def test_partitioned_gin_matches_single_device():
    """The edge-partitioned GIN (ring halo + sync-BN inside shard_map)
    equals the single-device GIN encoder on the union graph, with the
    SAME variables, in both train and eval mode."""
    from scgib_tpu.models.encoders import GIN
    from scgib_tpu.parallel.partitioned_gin import PartitionedGIN

    graphs = random_dataset(16, seed=21, min_nodes=8, max_nodes=30)
    g = pack_graphs(graphs, 512, 2048, 16)
    m = np.asarray(g.edge_mask)
    s = np.asarray(g.senders)[m]
    r = np.asarray(g.receivers)[m]
    plan = partition_edges_ring(s, r, g.num_nodes, N_SHARDS)

    rng = np.random.default_rng(2)
    d = 16
    x = jnp.asarray(rng.normal(size=(g.num_nodes, d)), jnp.float32)

    single = GIN(hidden=d, num_convs=3)
    variables = single.init(jax.random.PRNGKey(0), x, g.senders,
                            g.receivers, node_mask=g.node_mask,
                            edge_mask=g.edge_mask, train=False)

    part = PartitionedGIN(hidden=d, num_convs=3, radius=plan.radius)
    mesh = make_mesh(jax.devices()[:N_SHARDS])
    per = plan.nodes_per_shard

    for train in (False, True):
        want, want_bs = single.apply(
            variables, x, g.senders, g.receivers, node_mask=g.node_mask,
            edge_mask=g.edge_mask, train=train, mutable=["batch_stats"])

        def shard_fn(v, h_loc, sol, rl, em, nm):
            out, bs = part.apply(
                v, h_loc[0], sol[:, 0], rl[:, 0], em[:, 0],
                node_mask=nm[0], train=train, mutable=["batch_stats"])
            return out[None], bs

        fn = jax.jit(shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P("data"), P(None, "data"), P(None, "data"),
                      P(None, "data"), P("data")),
            out_specs=(P("data"), P()), check_vma=False))
        got, got_bs = fn(
            variables, jnp.asarray(np.asarray(x).reshape(N_SHARDS, per, d)),
            jnp.asarray(plan.senders_owner_local),
            jnp.asarray(plan.receivers_local),
            jnp.asarray(plan.edge_mask),
            jnp.asarray(np.asarray(g.node_mask).reshape(N_SHARDS, per)))
        np.testing.assert_allclose(
            np.asarray(got).reshape(g.num_nodes, d), np.asarray(want),
            rtol=2e-5, atol=2e-5)
        if train:
            # sync-BN running stats must match the union-batch stats
            for a, b in zip(
                    jax.tree_util.tree_leaves(want_bs),
                    jax.tree_util.tree_leaves(got_bs)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-5, atol=2e-5)
