"""Graph-transformer encoder vs a dense NumPy oracle.

The oracle replays the reference's per-edge attention exactly
(models.py:895-917): K·Q/sqrt(hd) edge scores, clamp(-5,5)+exp, divide by
the per-destination sum + 1e-6 (NOT a max-shifted softmax), u_mul_e sum,
then O-proj + residual + LayerNorm + FFN + LayerNorm per layer — but
computed with dense per-node loops instead of segment ops.
"""

import numpy as np
import jax
import jax.numpy as jnp

from scgib_tpu.models.encoders import GraphTransformer, GraphTransformerLayer


def _layer_oracle(p, h, senders, receivers, num_heads):
    n, d = h.shape
    hd = d // num_heads

    def dense(name, x):
        y = x @ np.asarray(p[name]["kernel"])
        if "bias" in p[name]:
            y = y + np.asarray(p[name]["bias"])
        return y

    def layernorm(name, x):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        xn = (x - mu) / np.sqrt(var + 1e-6)
        return xn * np.asarray(p[name]["scale"]) + np.asarray(p[name]["bias"])

    if "qkv" in p:          # fused-QKV storage (the default layout)
        qkv = dense("qkv", h)
        q = qkv[:, :d].reshape(n, num_heads, hd)
        k = qkv[:, d:2 * d].reshape(n, num_heads, hd)
        v = qkv[:, 2 * d:].reshape(n, num_heads, hd)
    else:
        q = dense("Q", h).reshape(n, num_heads, hd)
        k = dense("K", h).reshape(n, num_heads, hd)
        v = dense("V", h).reshape(n, num_heads, hd)

    E = len(senders)
    score = np.einsum("ehd,ehd->eh", k[senders], q[receivers]) / np.sqrt(hd)
    w = np.exp(np.clip(score, -5.0, 5.0))
    denom = np.zeros((n, num_heads))
    for e in range(E):
        denom[receivers[e]] += w[e]
    w = w / (denom[receivers] + 1e-6)

    attn = np.zeros((n, num_heads, hd))
    for e in range(E):
        attn[receivers[e]] += w[e][:, None] * v[senders[e]]
    attn = attn.reshape(n, d)

    h = layernorm("ln1", h + dense("O", attn))
    h2 = np.maximum(dense("ffn1", h), 0.0)
    return layernorm("ln2", h + dense("ffn2", h2))


def _random_graph(rng, n=14, extra=10):
    s = np.concatenate([np.arange(n - 1), rng.integers(0, n, extra)])
    r = np.concatenate([np.arange(1, n), rng.integers(0, n, extra)])
    keep = s != r
    s, r = s[keep], r[keep]
    s2 = np.concatenate([s, r]).astype(np.int32)
    r2 = np.concatenate([r, s]).astype(np.int32)
    order = np.lexsort((s2, r2))
    return s2[order], r2[order]


def test_layer_matches_oracle():
    rng = np.random.default_rng(0)
    n, d, heads = 14, 16, 4
    s, r = _random_graph(rng, n)
    h = rng.normal(size=(n, d)).astype(np.float32)

    layer = GraphTransformerLayer(hidden=d, num_heads=heads)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(h),
                           jnp.asarray(s), jnp.asarray(r), train=False)
    out = layer.apply(variables, jnp.asarray(h), jnp.asarray(s),
                      jnp.asarray(r), train=False)
    p = jax.tree.map(np.asarray, variables["params"])
    want = _layer_oracle(p, h.astype(np.float64), s, r, heads)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-4)


def test_full_encoder_matches_oracle():
    rng = np.random.default_rng(1)
    n, d, heads, layers = 12, 16, 4, 2
    s, r = _random_graph(rng, n)
    x = rng.normal(size=(n, 9)).astype(np.float32)

    enc = GraphTransformer(hidden=d, num_layers=layers, num_heads=heads)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(s), jnp.asarray(r), train=False)
    out = enc.apply(variables, jnp.asarray(x), jnp.asarray(s),
                    jnp.asarray(r), train=False)

    from scgib_tpu.models.encoders import gt_layer_params

    p = jax.tree.map(np.asarray, variables["params"])
    h = x.astype(np.float64) @ np.asarray(p["embed"]["kernel"])
    for i in range(layers + 1):     # reference builds num_layers+1 layers
        h = _layer_oracle(gt_layer_params(p, i), h, s, r, heads)
    np.testing.assert_allclose(np.asarray(out), h, rtol=5e-4, atol=5e-4)


def test_masked_padding_has_no_effect():
    rng = np.random.default_rng(2)
    n, d, heads = 10, 16, 4
    s, r = _random_graph(rng, n)
    h = rng.normal(size=(n, d)).astype(np.float32)
    layer = GraphTransformerLayer(hidden=d, num_heads=heads)
    nm = jnp.ones(n, bool)
    em = jnp.ones(len(s), bool)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(h),
                           jnp.asarray(s), jnp.asarray(r), train=False)
    base = layer.apply(variables, jnp.asarray(h), jnp.asarray(s),
                       jnp.asarray(r), node_mask=nm, edge_mask=em,
                       train=False)

    # append pad nodes + masked self-loop pad edges
    hp = jnp.concatenate([jnp.asarray(h),
                          jnp.asarray(rng.normal(size=(4, d)),
                                      dtype=jnp.float32)])
    pad = np.full(6, n + 3, np.int32)
    sp = jnp.asarray(np.concatenate([s, pad]))
    rp = jnp.asarray(np.concatenate([r, pad]))
    nmp = jnp.concatenate([nm, jnp.zeros(4, bool)])
    emp = jnp.concatenate([em, jnp.zeros(6, bool)])
    padded = layer.apply(variables, hp, sp, rp, node_mask=nmp,
                         edge_mask=emp, train=False)
    np.testing.assert_allclose(np.asarray(base),
                               np.asarray(padded)[:n], rtol=1e-5,
                               atol=1e-5)


def test_banded_attention_matches_coo():
    """gt_banded_attention == sddmm+normalize+segment_sum on a packed
    batch with a real band layout."""
    from scgib_tpu.data.synthetic import random_dataset
    from scgib_tpu.graph.batching import pack_graphs
    from scgib_tpu.ops.segment import segment_normalize_exp, segment_sum
    from scgib_tpu.ops.spmm import sddmm_dot
    from scgib_tpu.ops.spmm_banded import gt_banded_attention

    graphs = random_dataset(16, seed=9, min_nodes=8, max_nodes=30)
    g = pack_graphs(graphs, 512, 2048, 16, banded="host")
    n = g.num_nodes
    heads, hd = 4, 8
    rng = np.random.default_rng(4)
    q = rng.normal(size=(n, heads, hd)).astype(np.float32)
    k = rng.normal(size=(n, heads, hd)).astype(np.float32)
    v = rng.normal(size=(n, heads, hd)).astype(np.float32)

    score = sddmm_dot(jnp.asarray(k), jnp.asarray(q), g.senders,
                      g.receivers) / np.sqrt(hd)
    w = segment_normalize_exp(score, g.receivers, n, mask=g.edge_mask)
    msg = jnp.take(jnp.asarray(v), g.senders, axis=0) * w[:, :, None]
    want = segment_sum(msg, g.receivers, n, mask=g.edge_mask)

    got = gt_banded_attention(jnp.asarray(g.band_blocks),
                              jnp.asarray(g.band_col_off),
                              jnp.asarray(q), jnp.asarray(k),
                              jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_encoder_banded_matches_coo_and_grads():
    """Full GraphTransformer: band path == COO path; grads finite."""
    from scgib_tpu.data.synthetic import random_dataset
    from scgib_tpu.graph.batching import pack_graphs

    graphs = random_dataset(8, seed=11, min_nodes=6, max_nodes=20)
    g = pack_graphs(graphs, 256, 1024, 8, banded="host")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(g.num_nodes, 9)), jnp.float32)

    enc = GraphTransformer(hidden=16, num_layers=1, num_heads=4)
    variables = enc.init(jax.random.PRNGKey(0), x, g.senders, g.receivers,
                         node_mask=g.node_mask, edge_mask=g.edge_mask,
                         train=False)
    coo = enc.apply(variables, x, g.senders, g.receivers,
                    node_mask=g.node_mask, edge_mask=g.edge_mask,
                    train=False)
    band = (jnp.asarray(g.band_blocks), jnp.asarray(g.band_col_off))
    banded = enc.apply(variables, x, g.senders, g.receivers,
                       node_mask=g.node_mask, edge_mask=g.edge_mask,
                       band=band, train=False)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(coo),
                               rtol=5e-4, atol=5e-4)

    def loss(params):
        out = enc.apply({"params": params}, x, g.senders, g.receivers,
                        node_mask=g.node_mask, edge_mask=g.edge_mask,
                        band=band, train=False)
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


import pytest


@pytest.mark.parametrize("bf16", [False, True])
def test_gt_flash_matches_banded_xla(bf16):
    """The flash Pallas kernels (interpret mode on CPU) match the XLA
    banded attention — forward AND input grads.  bf16=False is the
    strict-parity mode; bf16=True is the default native-MXU mode with
    mixed-precision tolerances."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from scgib_tpu.graph.banded import pack_banded
    from scgib_tpu.ops.pallas.gt_flash import gt_flash_attention
    from scgib_tpu.ops.spmm_banded import gt_banded_attention

    rng = np.random.default_rng(0)
    n, H, hd = 256, 8, 8
    # banded adjacency from a random near-diagonal edge set
    send, recv = [], []
    for v in range(n):
        for _ in range(3):
            u = int(np.clip(v + rng.integers(-20, 21), 0, n - 1))
            send += [u, v]
            recv += [v, u]
    senders = np.asarray(send, np.int32)
    receivers = np.asarray(recv, np.int32)
    b = pack_banded(senders, receivers, None, n, tile=128, band=256)
    blocks = jnp.asarray(b.blocks)
    col_off = jnp.asarray(b.col_off)

    q = jnp.asarray(rng.normal(size=(n, H, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(n, H, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n, H, hd)), jnp.float32)

    def loss_ref(q, k, v):
        out = gt_banded_attention(blocks, col_off, q, k, v)
        return jnp.sum(jnp.sin(out)), out

    def loss_flash(q, k, v):
        out = gt_flash_attention(blocks, col_off, q, k, v,
                                 bf16_dots=bf16)
        return jnp.sum(jnp.sin(out)), out

    (_, out_a), grads_a = jax.value_and_grad(loss_ref, argnums=(0, 1, 2),
                                             has_aux=True)(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        (_, out_b), grads_b = jax.value_and_grad(
            loss_flash, argnums=(0, 1, 2), has_aux=True)(q, k, v)

    rtol, atol = (3e-2, 3e-2) if bf16 else (2e-5, 2e-5)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=rtol, atol=atol)
    for ga, gb, name in zip(grads_a, grads_b, "qkv"):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=10 * rtol, atol=10 * atol,
                                   err_msg=f"d{name}")


def test_gt_flash_merged_bwd_matches_twopass():
    """The single-pass backward (round-5 default: dk/dv scatter-
    accumulated from the row pass over the sequential grid) agrees with
    the round-4 two-pass row/column split (SCGIB_GT_BWD_TWOPASS=1) up to
    reduction order, in strict-f32 interpret mode."""
    import os

    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from scgib_tpu.graph.banded import pack_banded
    from scgib_tpu.ops.pallas.gt_flash import gt_flash_attention

    rng = np.random.default_rng(3)
    n, H, hd = 256, 8, 8
    send, recv = [], []
    for v in range(n):
        for _ in range(3):
            u = int(np.clip(v + rng.integers(-20, 21), 0, n - 1))
            send += [u, v]
            recv += [v, u]
    b = pack_banded(np.asarray(send, np.int32),
                    np.asarray(recv, np.int32), None, n,
                    tile=128, band=256)
    blocks = jnp.asarray(b.blocks)
    col_off = jnp.asarray(b.col_off)
    q = jnp.asarray(rng.normal(size=(n, H, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(n, H, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n, H, hd)), jnp.float32)

    def loss(q, k, v):
        out = gt_flash_attention(blocks, col_off, q, k, v,
                                 bf16_dots=False)
        return jnp.sum(jnp.sin(out))

    grad_fn = jax.grad(loss, argnums=(0, 1, 2))
    with pltpu.force_tpu_interpret_mode():
        merged = grad_fn(q, k, v)
        os.environ["SCGIB_GT_BWD_TWOPASS"] = "1"
        try:
            twopass = grad_fn(q, k, v)
        finally:
            del os.environ["SCGIB_GT_BWD_TWOPASS"]
    for ga, gb, name in zip(merged, twopass, "qkv"):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"d{name}")


def test_scanned_layer_stack_matches_oracle():
    """SCGIB_GT_SCAN=1 (stacked [L, ...] params via nn.scan — default-off
    perf alternative) produces an encoder whose stacked layers replay the
    same oracle math; gt_layer_params reads the stacked layout."""
    import os

    from scgib_tpu.models.encoders import gt_layer_params

    rng = np.random.default_rng(6)
    n, d, heads, layers = 12, 16, 4, 1
    s, r = _random_graph(rng, n)
    x = rng.normal(size=(n, 9)).astype(np.float32)

    os.environ["SCGIB_GT_SCAN"] = "1"
    try:
        enc = GraphTransformer(hidden=d, num_layers=layers,
                               num_heads=heads)
        variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x),
                             jnp.asarray(s), jnp.asarray(r), train=False)
        out = enc.apply(variables, jnp.asarray(x), jnp.asarray(s),
                        jnp.asarray(r), train=False)
    finally:
        del os.environ["SCGIB_GT_SCAN"]

    p = jax.tree.map(np.asarray, variables["params"])
    assert "layers" in p            # stacked layout
    h = x.astype(np.float64) @ np.asarray(p["embed"]["kernel"])
    for i in range(layers + 1):
        h = _layer_oracle(gt_layer_params(p, i), h, s, r, heads)
    np.testing.assert_allclose(np.asarray(out), h, rtol=5e-4, atol=5e-4)
