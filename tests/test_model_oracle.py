"""Golden-math tests: the vectorized S-CGIB model vs. a NumPy oracle that
implements the reference's math the way the reference does it — with explicit
per-graph Python loops (models.py:631-660, 728-750) — using the *same*
parameters.  This validates the vectorization (masked segment ops) end to
end, including the deterministic compression path, attention, and all three
pretraining losses.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.graph.batching import pack_graphs, pack_subgraphs
from scgib_tpu.graph.egonet import extract_egonets
from scgib_tpu.models.scgib import PretrainModel

HID = 16
DT = 8
FEAT = 5


def build_batch(n_graphs=3, node_cap=64, edge_cap=256, sub_node_cap=256,
                sub_edge_cap=1024, seed=3, k=1, feat_dim=None):
    graphs = random_dataset(n_graphs, seed=seed, min_nodes=5, max_nodes=9,
                            feat_dim=feat_dim or FEAT)
    egos = [extract_egonets(g, k) for g in graphs]
    g = pack_graphs(graphs, node_cap, edge_cap, max(4, n_graphs))
    sub = pack_subgraphs(graphs, egos, sub_node_cap, sub_edge_cap)
    return graphs, egos, g, sub


def to_np(t):
    return np.asarray(t, dtype=np.float64)


class Oracle:
    """Reference math in NumPy (per-graph loops), float64."""

    def __init__(self, params, graphs, egos):
        self.p = jax.tree_util.tree_map(to_np, params)
        self.stats = jax.tree_util.tree_map(
            to_np, params.get("batch_stats", {}))
        self.train = True
        self.graphs = graphs
        self.egos = egos
        # global concatenated arrays (real entries only)
        def norm_rows(z):
            n = np.linalg.norm(z, axis=1, keepdims=True)
            return z / np.maximum(n, 1e-12)

        # the models L2-normalize input features (reference train loops'
        # F.normalize, exp_pretraining.py:312-314)
        self.x = norm_rows(np.concatenate(
            [g.node_feat for g in graphs]).astype(np.float64))
        offs = np.cumsum([0] + [g.num_nodes for g in graphs])
        self.offs = offs
        self.seg = np.concatenate([
            np.full(g.num_nodes, i) for i, g in enumerate(graphs)])
        self.senders = np.concatenate([
            g.senders + offs[i] for i, g in enumerate(graphs)])
        self.receivers = np.concatenate([
            g.receivers + offs[i] for i, g in enumerate(graphs)])
        # flattened subgraph arrays
        xs, ss, rs, cen = [], [], [], []
        s_off = 0
        for i, (g, ego) in enumerate(zip(graphs, egos)):
            for v, (nl, (es, er)) in enumerate(zip(ego.node_lists,
                                                   ego.edge_lists)):
                xs.append(g.node_feat[nl])
                ss.append(es + s_off)
                rs.append(er + s_off)
                cen.append(np.full(len(nl), offs[i] + v))
                s_off += len(nl)
        self.x_sub = norm_rows(np.concatenate(xs).astype(np.float64))
        self.sub_senders = np.concatenate(ss)
        self.sub_receivers = np.concatenate(rs)
        self.sub_center = np.concatenate(cen)

    # --- layers -----------------------------------------------------------
    def dense(self, p, x):
        y = x @ to_np(p["kernel"])
        if "bias" in p:
            y = y + to_np(p["bias"])
        return y

    def mlp2(self, p, x):
        return self.dense(p["Dense_1"],
                          np.maximum(self.dense(p["Dense_0"], x), 0))

    def bn_train(self, p, x, stats=None):
        if self.train:
            mean = x.mean(0)
            var = ((x - mean) ** 2).mean(0)
        else:
            # eval mode: torch nn.BatchNorm1d running statistics
            # (fine-tune selection runs eval forwards,
            # train_moleculenetBACE.py:180-199)
            mean = to_np(stats["mean"])
            var = to_np(stats["var"])
        y = (x - mean) / np.sqrt(var + 1e-5)
        return y * to_np(p["scale"]) + to_np(p["bias"])

    def gin(self, p, x, senders, receivers, stats=None):
        h = x
        n = x.shape[0]
        n_convs = sum(1 for k in p if k.startswith("conv"))
        for i in range(n_convs):
            agg = np.zeros_like(h)
            np.add.at(agg, receivers, h[senders])
            h = self.mlp2(p[f"conv{i}"], h + agg)
            h = self.bn_train(p[f"bn{i}"],
                              h, (stats or {}).get(f"bn{i}"))
            h = np.maximum(h, 0)
        return h

    # --- the reference forward (per-graph loops) ---------------------------
    def run(self, kl_mode="corrected"):
        p = self.p["params"]
        core = p["core"]
        wt = to_np(p["transfer_d"]["kernel"])
        x_proj = self.x @ wt
        x_sub_proj = self.x_sub @ wt

        score_stats = self.stats.get("core", {})
        h = self.gin(core["encoder1"], x_proj, self.senders,
                     self.receivers, score_stats.get("encoder1"))
        h_sub = self.gin(core["encoder2"], x_sub_proj, self.sub_senders,
                         self.sub_receivers, score_stats.get("encoder2"))

        n_graphs = len(self.graphs)
        d = h.shape[1]
        clean_readout = np.zeros((n_graphs, d))
        for i in range(n_graphs):
            clean_readout[i] = h[self.seg == i].sum(0)

        # compression: per-graph loop, deterministic gate = sigmoid(p)
        noisy = np.zeros_like(h)
        kl_rows = []
        eps = 1e-7
        for i in range(n_graphs):
            rows = self.seg == i
            feats = h[rows]
            z = self.dense(core["compressor"]["fc1"], feats)
            # per-graph BN in train mode; shared running stats in eval
            z = self.bn_train(core["compressor"]["bn"], z,
                              score_stats.get("compressor", {}).get("bn"))
            z = np.maximum(z, 0)
            pv = self.dense(core["compressor"]["fc2"], z)
            lam = 1 / (1 + np.exp(-pv))
            lam_neg = 1 - lam
            std = feats.std(0, ddof=1) if feats.shape[0] > 1 else \
                np.zeros(d)
            mean = feats.mean(0)
            noisy_mean = lam * feats + lam_neg * mean
            noisy_std = lam_neg * std
            noisy[rows] = noisy_mean  # deterministic: no uniform noise
            kl = 0.5 * (noisy_std ** 2) / (std + eps) ** 2 + np.sum(
                ((noisy_mean - mean) / (std + eps)) ** 2, axis=0)
            kl_rows.append(kl)

        # candidates: sum over each ego-net
        cand = np.zeros_like(h)
        np.add.at(cand, self.sub_center, h_sub)

        # attention per graph
        att_w = core["attn_layer"]
        im = np.zeros((h.shape[0], 2 * d))
        for i in range(n_graphs):
            rows = np.flatnonzero(self.seg == i)
            nr = noisy[rows].sum(0)
            inter = np.concatenate(
                [np.tile(nr, (len(rows), 1)), cand[rows]], -1)
            score = self.dense(att_w, inter)
            e = np.exp(score - score.max())
            alpha = e / e.sum()
            im[rows] = np.concatenate([noisy[rows], cand[rows] * alpha], -1)

        im_head = self.mlp2(p["head_mlp"], im)

        # losses
        if kl_mode == "corrected":
            kl_loss = np.mean(np.concatenate(kl_rows, 0))
        else:
            kl_loss = np.mean(kl_rows[-1])

        def norm_rows(z):
            return z / np.maximum(np.linalg.norm(z, axis=1, keepdims=True),
                                  1e-12)

        z1 = np.stack([noisy[self.seg == i].sum(0)
                       for i in range(n_graphs)])
        z2 = clean_readout
        z1n, z2n = norm_rows(z1), norm_rows(z2)
        refl = np.exp(z1n @ z1n.T)
        betw = np.exp(z1n @ z2n.T)
        li = -np.log(np.diag(betw) / (refl.sum(1) + betw.sum(1)
                                      - np.diag(refl)))
        contrastive = li.mean()

        n_total = h.shape[0]
        A = np.zeros((n_total, n_total))
        A[self.senders, self.receivers] = 1.0
        gram = im_head @ im_head.T
        recon = np.sum((gram - A) ** 2) / n_total

        return dict(h=h, noisy=noisy, cand=cand, im=im, kl=kl_loss,
                    contrastive=contrastive, recon=recon,
                    clean_readout=clean_readout)


@pytest.fixture(scope="module")
def setup():
    graphs, egos, g, sub = build_batch()
    model = PretrainModel(in_dim=FEAT, hidden=HID, d_transfer=DT,
                          deterministic=True, kl_mode="corrected")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g, sub, train=True)
    return graphs, egos, g, sub, model, variables


def test_pretrain_losses_match_oracle(setup):
    graphs, egos, g, sub, model, variables = setup
    losses, _ = model.apply(variables, g, sub, train=True,
                            mutable=["batch_stats"],
                            rngs={"noise": jax.random.PRNGKey(2)})
    oracle = Oracle(variables, graphs, egos).run("corrected")
    np.testing.assert_allclose(float(losses.kl), oracle["kl"],
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(losses.contrastive),
                               oracle["contrastive"], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(losses.reconstruction),
                               oracle["recon"], rtol=2e-3, atol=1e-4)


def test_features_match_oracle(setup):
    graphs, egos, g, sub, model, variables = setup

    def features(m, g_, sub_):
        from scgib_tpu.models.losses import l2_normalize
        from scgib_tpu.models.scgib import _sub_features
        xp = m.transfer_d(l2_normalize(g_.node_feat))
        xs = m.transfer_d(l2_normalize(_sub_features(g_, sub_)))
        return m.core.extract_features(g_, sub_, xp, xs, train=True)

    feats, _ = model.apply(variables, g, sub, method=features,
                           mutable=["batch_stats"],
                           rngs={"noise": jax.random.PRNGKey(2)})
    oracle = Oracle(variables, graphs, egos).run("corrected")

    mask = np.asarray(g.node_mask)
    np.testing.assert_allclose(np.asarray(feats.noisy)[mask],
                               oracle["noisy"], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(feats.interaction_map)[mask],
                               oracle["im"], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(feats.clean_readout)[:3],
                               oracle["clean_readout"], rtol=2e-3, atol=2e-4)


def test_padding_invariance(setup):
    """Same graphs packed with different capacities give the same losses."""
    graphs, egos, g, sub, model, variables = setup
    g2 = pack_graphs(graphs, 128, 512, 8)
    egos2 = [extract_egonets(gr, 1) for gr in graphs]
    sub2 = pack_subgraphs(graphs, egos2, 512, 2048)

    l1, _ = model.apply(variables, g, sub, train=True,
                        mutable=["batch_stats"],
                        rngs={"noise": jax.random.PRNGKey(2)})
    # params were initialized against the first capacities; apply is
    # shape-polymorphic because all ops are segment-based
    l2, _ = model.apply(variables, g2, sub2, train=True,
                        mutable=["batch_stats"],
                        rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(float(l1.kl), float(l2.kl), rtol=1e-5)
    np.testing.assert_allclose(float(l1.contrastive), float(l2.contrastive),
                               rtol=1e-5)
    np.testing.assert_allclose(float(l1.reconstruction),
                               float(l2.reconstruction), rtol=1e-4)


def test_kl_reference_mode(setup):
    """kl_mode='reference' reproduces the last-graph-only bug
    (models.py:659)."""
    graphs, egos, g, sub, model, variables = setup
    ref_model = PretrainModel(in_dim=FEAT, hidden=HID, d_transfer=DT,
                              deterministic=True, kl_mode="reference")
    losses, _ = ref_model.apply(variables, g, sub, train=True,
                                mutable=["batch_stats"],
                                rngs={"noise": jax.random.PRNGKey(2)})
    oracle = Oracle(variables, graphs, egos).run("reference")
    np.testing.assert_allclose(float(losses.kl), oracle["kl"],
                               rtol=2e-4, atol=1e-5)


def test_noise_modes_differ(setup):
    """Stochastic mode actually injects noise (different draws differ)."""
    graphs, egos, g, sub, model, variables = setup
    stoch = PretrainModel(in_dim=FEAT, hidden=HID, d_transfer=DT,
                          deterministic=False)
    l1, _ = stoch.apply(variables, g, sub, train=True,
                        mutable=["batch_stats"],
                        rngs={"noise": jax.random.PRNGKey(10)})
    l2, _ = stoch.apply(variables, g, sub, train=True,
                        mutable=["batch_stats"],
                        rngs={"noise": jax.random.PRNGKey(11)})
    assert float(l1.kl) != float(l2.kl)
    assert np.isfinite(float(l1.total)) and np.isfinite(float(l2.total))


def test_k2_egonets_match_oracle():
    """k=2 ego-nets: restricted message passing over 2-hop neighborhoods
    must match the per-graph-loop oracle (the k>1 'hard part' of
    SURVEY.md §7.3)."""
    graphs, egos, g, sub = build_batch(k=2, sub_node_cap=512,
                                       sub_edge_cap=4096, seed=5)
    model = PretrainModel(in_dim=FEAT, hidden=HID, d_transfer=DT,
                          deterministic=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        g, sub, train=True)
    losses, _ = model.apply(variables, g, sub, train=True,
                            mutable=["batch_stats"],
                            rngs={"noise": jax.random.PRNGKey(2)})
    oracle = Oracle(variables, graphs, egos).run("corrected")
    np.testing.assert_allclose(float(losses.kl), oracle["kl"],
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(losses.contrastive),
                               oracle["contrastive"], rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(losses.reconstruction),
                               oracle["recon"], rtol=2e-3, atol=1e-4)


def test_reference_weights_activation_parity():
    """Golden activation parity with the SHIPPED reference artifact: run
    the imported (trained) weights through our vectorized model and
    through the per-graph-loop NumPy oracle (the reference's math) — the
    losses must agree.  This is the closest possible check to running the
    reference itself (DGL is unavailable here)."""
    import os

    ref_cp = "/root/reference/outputs/pre_training_v1_GIN_64_5_1.pt"
    if not os.path.exists(ref_cp):
        pytest.skip("reference artifact not present")
    from scgib_tpu.utils.reference_import import (
        convert_to_pretrain_variables, load_reference_state)

    flat = load_reference_state(ref_cp)
    variables, meta = convert_to_pretrain_variables(flat)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    graphs, egos, g, sub = build_batch(seed=11, feat_dim=9)
    model = PretrainModel(in_dim=9, hidden=64, d_transfer=32,
                          num_layers=meta["num_convs"],
                          deterministic=True)
    losses, _ = model.apply(variables, g, sub, train=True,
                            mutable=["batch_stats"],
                            rngs={"noise": jax.random.PRNGKey(2)})
    oracle = Oracle(variables, graphs, egos).run("corrected")
    np.testing.assert_allclose(float(losses.kl), oracle["kl"],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(losses.contrastive),
                               oracle["contrastive"], rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(float(losses.reconstruction),
                               oracle["recon"], rtol=5e-3, atol=1e-3)


def test_eval_mode_running_bn_parity(setup):
    """Eval-mode forward must use BatchNorm RUNNING statistics — the
    reference's fine-tune selection evaluates in eval() mode
    (train_moleculenetBACE.py:180-199); round-1 parity covered train mode
    only (VERDICT round-1 missing 2)."""
    graphs, egos, g, sub, model, variables = setup

    # evolve the running stats away from their init with train forwards
    vars2 = variables
    for i in range(3):
        _, mut = model.apply(vars2, g, sub, train=True,
                             mutable=["batch_stats"],
                             rngs={"noise": jax.random.PRNGKey(10 + i)})
        vars2 = {"params": variables["params"],
                 "batch_stats": mut["batch_stats"]}
    # sanity: stats actually moved
    m0 = np.asarray(variables["batch_stats"]["core"]["encoder1"]["bn0"]
                    ["mean"])
    m1 = np.asarray(vars2["batch_stats"]["core"]["encoder1"]["bn0"]
                    ["mean"])
    assert not np.allclose(m0, m1)

    losses, _ = model.apply(vars2, g, sub, train=False,
                            mutable=["batch_stats"],
                            rngs={"noise": jax.random.PRNGKey(9)})

    oracle = Oracle(vars2, graphs, egos)
    oracle.train = False
    ref = oracle.run()
    np.testing.assert_allclose(float(losses.kl), ref["kl"], rtol=1e-4)
    np.testing.assert_allclose(float(losses.contrastive),
                               ref["contrastive"], rtol=1e-4)
    np.testing.assert_allclose(float(losses.reconstruction), ref["recon"],
                               rtol=1e-4)
