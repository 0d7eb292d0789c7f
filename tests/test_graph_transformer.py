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

    p = jax.tree.map(np.asarray, variables["params"])
    h = x.astype(np.float64) @ np.asarray(p["embed"]["kernel"])
    for i in range(layers + 1):     # reference builds num_layers+1 layers
        h = _layer_oracle(p[f"layer{i}"], h, s, r, heads)
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
