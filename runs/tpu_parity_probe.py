"""On-chip numerical parity probes for the round-4 kernels.

Runs each Pallas/precision fast path against its exact XLA reference ON
THE REAL TPU and records max relative errors -> TPU_PARITY_r05.json.
Correctness-only (no timing), so it can share the chip with training.
"""
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from scgib_tpu.graph.banded import pack_banded
from scgib_tpu.ops.pallas.banded import (gin_banded_layer,
                                         gin_banded_layer_reference,
                                         pool_banded_pallas, _spmm_pallas)
from scgib_tpu.ops.spmm_banded import banded_spmm, gt_banded_attention
from scgib_tpu.ops import segment as seg

out = {"device": str(jax.devices()[0]), "probes": {}}
rng = np.random.default_rng(0)


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    d = np.abs(a - b).max()
    s = max(np.abs(b).max(), 1e-12)
    return float(d / s)


def band_fixture(n=4096, d=64, tile=128, band=256):
    send, recv = [], []
    for v in range(n):
        for _ in range(3):
            u = int(np.clip(v + rng.integers(-25, 26), 0, n - 1))
            send += [u, v]
            recv += [v, u]
    b = pack_banded(np.asarray(send, np.int32), np.asarray(recv, np.int32),
                    None, n, tile=tile, band=band)
    return (jnp.asarray(b.blocks.astype(np.float32)),
            jnp.asarray(b.blocks.astype(jnp.bfloat16)),
            jnp.asarray(b.col_off))

blocks_f32, blocks_bf16, col_off = band_fixture()
n, d = 4096, 64
h = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
w1 = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.2)
b1 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1)
w2 = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.2)
b2 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1)

# 1. fused GIN conv layer (bf16 blocks) fwd + input/weight grads.
# Two references: the XLA path at DEFAULT precision (same native-MXU
# bf16-multiplicand mode — implementation parity) and at HIGHEST
# (near-exact f32 — the absolute numerics context: the ~3e-3 gap is the
# documented native-mode rounding every flax Dense also has).  The grad
# probe loss is LINEAR (sum(out * R)) so fwd rounding does not amplify
# chaotically through the loss.
R = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)) / d


def loss_pal(h, w1, b1, w2, b2):
    return jnp.sum(R * gin_banded_layer(blocks_bf16, col_off, h, w1, b1,
                                        w2, b2))


def make_loss_ref(prec):
    def loss_ref(h, w1, b1, w2, b2):
        with jax.default_matmul_precision(prec):
            return jnp.sum(R * gin_banded_layer_reference(
                blocks_f32, col_off, h, w1, b1, w2, b2))
    return loss_ref


fwd_pal = jax.jit(lambda: gin_banded_layer(blocks_bf16, col_off, h, w1,
                                           b1, w2, b2))()
gp = jax.jit(jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4)))(h, w1, b1, w2, b2)
for prec, tag in (("default", "native"), ("highest", "exactf32")):
    def _fwd_ref(prec=prec):
        with jax.default_matmul_precision(prec):
            return gin_banded_layer_reference(blocks_f32, col_off, h, w1,
                                              b1, w2, b2)
    fwd_ref = jax.jit(_fwd_ref)()
    gr = jax.jit(jax.grad(make_loss_ref(prec),
                          argnums=(0, 1, 2, 3, 4)))(h, w1, b1, w2, b2)
    out["probes"][f"gin_conv_fwd_vs_{tag}"] = rel(fwd_pal, fwd_ref)
    for name, a, b in zip(("dh", "dw1", "db1", "dw2", "db2"), gp, gr):
        out["probes"][f"gin_conv_{name}_vs_{tag}"] = rel(a, b)

# 2. Pallas pool kernel (bf16 blocks + hi/lo 2-pass) vs exact f64 scatter
S = 16384
segids = np.sort(rng.integers(0, n, size=S)).astype(np.int32)
data = rng.normal(size=(S, d)).astype(np.float32)
mask = np.ones(S, bool); mask[-256:] = False
from scgib_tpu.ops.pool import sorted_segment_sum_banded
got = jax.jit(lambda x: sorted_segment_sum_banded(
    x, jnp.asarray(segids), n, mask=jnp.asarray(mask)))(jnp.asarray(data))
exact = np.zeros((n, d))
np.add.at(exact, segids[mask], data[mask].astype(np.float64))
out["probes"]["pool_banded_vs_exact"] = rel(got, exact)

# 3. GT flash attention (both precisions) vs XLA banded composition
from scgib_tpu.ops.pallas import gt_flash as gtf
H, hd = 8, 8
q = jnp.asarray(rng.normal(size=(n, H, hd)).astype(np.float32))
k = jnp.asarray(rng.normal(size=(n, H, hd)).astype(np.float32))
v = jnp.asarray(rng.normal(size=(n, H, hd)).astype(np.float32))

def gt_loss(fn):
    def f(q, k, v):
        return jnp.sum(jnp.sin(fn(blocks_bf16, col_off, q, k, v)))
    return f

RQ = jnp.asarray(rng.normal(size=(n, H, hd)).astype(np.float32)) / hd
for prec, tag in (("default", "native"), ("highest", "exactf32")):
    def _gt_ref(prec=prec):
        with jax.default_matmul_precision(prec):
            return gt_banded_attention(blocks_f32, col_off, q, k, v)
    ref_out = jax.jit(_gt_ref)()

    def _gt_ref_loss(q, k, v, prec=prec):
        with jax.default_matmul_precision(prec):
            return jnp.sum(RQ * gt_banded_attention(blocks_f32, col_off,
                                                    q, k, v))
    ref_g = jax.jit(jax.grad(_gt_ref_loss, (0, 1, 2)))(q, k, v)
    got_out = jax.jit(lambda: gtf.gt_flash_attention(
        blocks_bf16, col_off, q, k, v))()

    def _gt_loss(q, k, v):
        return jnp.sum(RQ * gtf.gt_flash_attention(blocks_bf16, col_off,
                                                   q, k, v))
    got_g = jax.jit(jax.grad(_gt_loss, (0, 1, 2)))(q, k, v)
    out["probes"][f"gt_flash_fwd_vs_{tag}"] = rel(got_out, ref_out)
    for nm, a, b in zip("qkv", got_g, ref_g):
        out["probes"][f"gt_flash_d{nm}_vs_{tag}"] = rel(a, b)

# 4. dense one-hot segment ops at HIGH precision vs exact scatter
ids = np.sort(rng.integers(0, 128, size=n)).astype(np.int32)
x128 = rng.normal(size=(n, d)).astype(np.float32)
got = jax.jit(lambda x: seg._segment_sum_dense(x, jnp.asarray(ids), 128))(
    jnp.asarray(x128))
exact = np.zeros((128, d))
np.add.at(exact, ids, x128.astype(np.float64))
out["probes"]["segment_sum_high_vs_exact"] = rel(got, exact)

# 5. SAGE Pallas SpMM vs XLA banded (the restored fast path)
got = jax.jit(lambda x: _spmm_pallas(blocks_bf16, col_off, x))(h)
want = jax.jit(lambda x: banded_spmm(blocks_f32, col_off, x))(h)
out["probes"]["sage_spmm_pallas_vs_xla"] = rel(got, want)

print(json.dumps(out, indent=1))
with open("/root/repo/TPU_PARITY_r05.json", "w") as f:
    json.dump(out, f, indent=1)
