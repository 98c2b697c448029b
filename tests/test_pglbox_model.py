"""PGLBox model assembly: relation layers, interaction, hetero residual,
slot embeddings, in-batch negatives — the AutoHeterGNN analog
(reference ``apps/PGLBox/src/models/``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from pgl_tpu import HeterGraph
from pgl_tpu.sampling import HeteroNeighborSampler
from pgl_tpu.apps.pglbox_model import (RelationLayer, FeatureInteraction,
                                       PGLBoxGNNModel, LAYER_TYPES,
                                       inbatch_negative_loss)


def _hetero(seed=0, n_u=50, n_i=80, per_u=6, C=3):
    rng = np.random.default_rng(seed)
    ucl = rng.integers(0, C, n_u)
    icl = rng.integers(0, C, n_i)
    pairs = []
    for u in range(n_u):
        own = np.nonzero(icl == ucl[u])[0]
        for _ in range(per_u):
            i = int(own[rng.integers(len(own))]) if len(own) \
                else int(rng.integers(n_i))
            pairs.append((u, n_u + i))
    pairs = np.asarray(pairs)
    hg = HeterGraph({"u2i": pairs, "i2u": pairs[:, ::-1]},
                    num_nodes=n_u + n_i,
                    node_types=[(i, "u" if i < n_u else "i")
                                for i in range(n_u + n_i)])
    return hg, pairs, np.concatenate([ucl, icl]), C


@pytest.mark.parametrize("kind", LAYER_TYPES)
def test_relation_layer_shapes_and_masking(kind):
    rng = np.random.default_rng(0)
    M, k, D = 7, 4, 8
    h_self = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
    h_neigh = jnp.asarray(rng.normal(size=(M, k, D)).astype(np.float32))
    mask = jnp.asarray(rng.random((M, k)) < 0.7)
    mask = mask.at[0].set(False)          # a zero-degree row
    layer = RelationLayer(kind, D)
    params = layer.init(jax.random.key(0), h_self, h_neigh, mask)
    out = layer.apply(params, h_self, h_neigh, mask)
    assert out.shape == (M, D)
    assert np.isfinite(np.asarray(out)).all()
    # masked neighbors must not influence the output
    h2 = h_neigh.at[1, 3].set(1e6)
    mask2 = mask.at[1, 3].set(False)
    o1 = layer.apply(params, h_self, h2, mask2)
    o2 = layer.apply(params, h_self, h_neigh.at[1, 3].set(-1e6), mask2)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-4)


def test_interaction_modes():
    rng = np.random.default_rng(0)
    fs = [jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
          for _ in range(3)]
    s = FeatureInteraction("sum", 8)
    out = s.apply(s.init(jax.random.key(0), fs), fs)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(fs[0] + fs[1] + fs[2]),
                               rtol=1e-6)
    g = FeatureInteraction("gatne", 8)
    outg = g.apply(g.init(jax.random.key(0), fs), fs)
    assert outg.shape == (5, 8)
    # attention output is a convex combination per row — stays inside the
    # min/max envelope of the inputs
    stack = np.stack([np.asarray(f) for f in fs], 1)
    assert (np.asarray(outg) <= stack.max(1) + 1e-5).all()
    assert (np.asarray(outg) >= stack.min(1) - 1e-5).all()


@pytest.mark.parametrize("layer_type", ["sage_mean", "gat", "lightgcn"])
def test_model_forward_all_types(layer_type):
    hg, pairs, cls, C = _hetero()
    sampler = HeteroNeighborSampler(hg, samples=(3, 3))
    model = PGLBoxGNNModel(num_nodes=hg.num_nodes, emb_size=16,
                           etypes=hg.edge_types, num_layers=2,
                           layer_type=layer_type)
    nodes = jnp.arange(32, dtype=jnp.int32)
    sampled, fin = sampler.sample(nodes, jax.random.key(0))
    params = model.init(jax.random.key(1), {}, sampled, fin)
    out = model.apply(params, {}, sampled, fin)
    assert out.shape == (32, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_slot_embeddings_change_output():
    hg, pairs, cls, C = _hetero()
    sampler = HeteroNeighborSampler(hg, samples=(3,))
    slot_tables = {"cls": jnp.asarray(cls.astype(np.int32))}
    model = PGLBoxGNNModel(num_nodes=hg.num_nodes, emb_size=16,
                           etypes=hg.edge_types, num_layers=1,
                           slot_sizes={"cls": C}, softsign=True)
    nodes = jnp.arange(16, dtype=jnp.int32)
    sampled, fin = sampler.sample(nodes, jax.random.key(0))
    params = model.init(jax.random.key(1), slot_tables, sampled, fin)
    out1 = model.apply(params, slot_tables, sampled, fin)
    flipped = {"cls": jnp.asarray(((cls + 1) % C).astype(np.int32))}
    out2 = model.apply(params, flipped, sampled, fin)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    assert "slot_cls" in params["params"]


def test_residual_alpha_one_freezes_gnn():
    """alpha_residual=1.0 means the output IS the initial embedding — the
    heter residual contract (auto_heter_gnn.py:161-165)."""
    hg, pairs, cls, C = _hetero()
    sampler = HeteroNeighborSampler(hg, samples=(3,))
    model = PGLBoxGNNModel(num_nodes=hg.num_nodes, emb_size=8,
                           etypes=hg.edge_types, num_layers=1,
                           alpha_residual=1.0)
    nodes = jnp.arange(10, dtype=jnp.int32)
    sampled, fin = sampler.sample(nodes, jax.random.key(0))
    params = model.init(jax.random.key(1), {}, sampled, fin)
    out = model.apply(params, {}, sampled, fin)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(params["params"]["id_emb"][:10]), rtol=1e-5)


def test_inbatch_negative_loss_prefers_matching():
    rng = np.random.default_rng(0)
    e = jnp.asarray(np.eye(8, dtype=np.float32) * 3)
    aligned = float(inbatch_negative_loss(e, e, jax.random.key(0), 4))
    shuffled = float(inbatch_negative_loss(
        e, e[jnp.asarray(rng.permutation(8))], jax.random.key(0), 4))
    assert aligned < shuffled


def test_end_to_end_training_separates_clusters():
    hg, pairs, cls, C = _hetero(per_u=8)
    n_u = 50
    sampler = HeteroNeighborSampler(hg, samples=(4, 4))
    slot_tables = {}
    model = PGLBoxGNNModel(num_nodes=hg.num_nodes, emb_size=16,
                           etypes=hg.edge_types, num_layers=2,
                           layer_type="sage_mean", interact_mode="gatne")
    opt = optax.adam(2e-2)
    B = 128

    @jax.jit
    def step(params, st, src, dst, key):
        k1, k2 = jax.random.split(key)
        nodes = jnp.concatenate([src, dst])
        sampled, fin = sampler.sample(nodes, k1)

        def lf(p):
            emb = model.apply(p, slot_tables, sampled, fin)
            return inbatch_negative_loss(emb[:B], emb[B:], k2, neg_num=4)

        l, g = jax.value_and_grad(lf)(params)
        up, st = opt.update(g, st)
        return optax.apply_updates(params, up), st, l

    rng = np.random.default_rng(1)
    b = rng.integers(0, len(pairs), B)
    nodes0 = jnp.asarray(np.concatenate([pairs[b, 0], pairs[b, 1]])
                         .astype(np.int32))
    sampled0, fin0 = sampler.sample(nodes0, jax.random.key(0))
    params = model.init(jax.random.key(1), slot_tables, sampled0, fin0)
    st = opt.init(params)
    key = jax.random.key(2)
    losses = []
    for it in range(80):
        key, sub = jax.random.split(key)
        b = rng.integers(0, len(pairs), B)
        params, st, l = step(params, st,
                             jnp.asarray(pairs[b, 0].astype(np.int32)),
                             jnp.asarray(pairs[b, 1].astype(np.int32)),
                             sub)
        losses.append(float(l))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.7
    # learned id embeddings recover user clusters (1-NN label agreement)
    emb = np.asarray(params["params"]["id_emb"])[:n_u]
    sim = emb @ emb.T
    np.fill_diagonal(sim, -np.inf)
    ucl = cls[:n_u]
    agree = float((ucl[sim.argmax(1)] == ucl).mean())
    assert agree > 0.6, agree
