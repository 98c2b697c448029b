"""Accuracy-contract convergence harness (stand-in for the reference's
real-dataset numbers, which need files this environment cannot download).

Each test trains a model on a fixed-seed planted-partition graph with a
held-out split and asserts a hard accuracy floor — the synthetic analog of
``/root/reference/examples/citation_benchmark/README.md:14-25`` (GCN .807
Cora, GAT .827, …) and the UniMP arxiv table (README.MD:50-58). The exact
commands that reproduce the real-dataset rows once files exist are mapped
in ``docs/ACCURACY.md``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from pgl_tpu import Graph
from pgl_tpu import models as M
from pgl_tpu.datasets import community_graph
from pgl_tpu.utils.transform import add_self_loops, to_undirected


def make_split(seed=0):
    g, labels = community_graph(num_nodes=500, num_classes=4, feat_dim=16,
                                avg_degree=10, noise=1.5, p_inter=0.05,
                                seed=seed)
    g = add_self_loops(to_undirected(g))
    rng = np.random.default_rng(seed)
    perm = rng.permutation(500)
    train_idx, test_idx = perm[:250], perm[250:]
    return (g.tensor(), jnp.asarray(labels), jnp.asarray(train_idx),
            jnp.asarray(test_idx))


def train_eval(model, g, y, train_idx, test_idx, steps=150, lr=1e-2,
               extra_apply=None):
    x = g.node_feat["h"]
    params = model.init(jax.random.key(0), g, x)
    opt = optax.adam(lr)
    ost = opt.init(params)

    @jax.jit
    def step(p, o, g, x, y):
        def loss_fn(p):
            out = model.apply(p, g, x, training=True,
                              rngs={"dropout": jax.random.key(7)})
            ce = optax.softmax_cross_entropy_with_integer_labels(out, y)
            return ce[train_idx].mean()

        l, grads = jax.value_and_grad(loss_fn)(p)
        up, o = opt.update(grads, o)
        return optax.apply_updates(p, up), o, l

    for _ in range(steps):
        params, ost, loss = step(params, ost, g, x, y)
    logits = model.apply(params, g, x)
    pred = jnp.argmax(logits, axis=-1)
    return float((pred[test_idx] == y[test_idx]).mean()), float(loss)


@pytest.fixture(scope="module")
def split():
    return make_split()


def test_gcn_converges(split):
    g, y, tr, te = split
    acc, loss = train_eval(
        M.GCN(input_size=16, num_class=4, num_layers=2, hidden_size=32,
              dropout=0.1), g, y, tr, te)
    assert acc >= 0.90, f"GCN held-out acc {acc} < 0.90 (loss {loss})"


def test_gat_converges(split):
    g, y, tr, te = split
    acc, loss = train_eval(
        M.GAT(input_size=16, num_class=4, num_heads=4, hidden_size=8,
              feat_drop=0.1, attn_drop=0.1), g, y, tr, te)
    assert acc >= 0.90, f"GAT held-out acc {acc} < 0.90 (loss {loss})"


def test_graphsage_converges(split):
    g, y, tr, te = split
    acc, loss = train_eval(
        M.GraphSage(input_size=16, num_class=4, num_layers=2,
                    hidden_size=32, dropout=0.1), g, y, tr, te)
    assert acc >= 0.90, f"SAGE held-out acc {acc} < 0.90 (loss {loss})"


def test_lstm_sage_converges(split):
    """UDF LSTM-aggregation model (the legacy speed-table family,
    legacy/docs introduction.md:58-63): same held-out floor."""
    g, y, tr, te = split
    acc, loss = train_eval(
        M.LSTMSage(input_size=16, num_class=4, hidden_size=16,
                   max_degree=16), g, y, tr, te)
    assert acc >= 0.90, f"LSTMSage held-out acc {acc} < 0.90 (loss {loss})"


def test_unimp_converges(split):
    """UniMP with label-propagation inputs: train labels are fed (masked),
    held-out accuracy must clear the floor — the masked-label-embedding
    contract of /root/reference/ogb_examples/.../unimp (model.py:60-92)."""
    from pgl_tpu.models.unimp import UniMP
    g, y, tr, te = split
    x = g.node_feat["h"]
    n = g.num_nodes
    label_mask = jnp.zeros((n,), bool).at[tr].set(True)
    model = UniMP(input_size=16, num_class=4, num_layers=2,
                  hidden_size=32, num_heads=2, dropout=0.1,
                  use_label_embed=True)
    params = model.init(jax.random.key(0), g, x, y, label_mask)
    opt = optax.adam(5e-3)
    ost = opt.init(params)

    @jax.jit
    def step(p, o, g, x, y, rng_key):
        def loss_fn(p):
            # randomly hide half the train labels each step (UniMP's
            # masked-label training trick)
            keep = jax.random.bernoulli(rng_key, 0.5, (n,))
            out = model.apply(p, g, x, y, label_mask & keep,
                              training=True,
                              rngs={"dropout": rng_key})
            ce = optax.softmax_cross_entropy_with_integer_labels(out, y)
            return ce[tr].mean()

        l, grads = jax.value_and_grad(loss_fn)(p)
        up, o = opt.update(grads, o)
        return optax.apply_updates(p, up), o, l

    key = jax.random.key(3)
    for i in range(150):
        key, sub = jax.random.split(key)
        params, ost, loss = step(params, ost, g, x, y, sub)
    logits = model.apply(params, g, x, y, label_mask)
    acc = float((jnp.argmax(logits, -1)[te] == y[te]).mean())
    assert acc >= 0.90, f"UniMP held-out acc {acc} < 0.90 ({float(loss)})"
