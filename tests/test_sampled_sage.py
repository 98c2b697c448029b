"""BipartiteSAGE: device-sampled GraphSAGE in a single jit.

Deterministic check: on a directed cycle every node has exactly one
in-neighbor, so with-replacement sampling is deterministic and the model's
output can be computed by hand from its params. Then an end-to-end test
trains sample→gather→layers→loss→grads inside ONE jitted step on a
community graph and asserts the accuracy floor.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from pgl_tpu import Graph
from pgl_tpu.datasets import community_graph
from pgl_tpu.models import BipartiteSAGE
from pgl_tpu.sampling import NeighborSampler


def _cycle_graph(n, d):
    edges = np.stack([np.arange(n), (np.arange(n) + 1) % n], 1)
    feat = np.arange(n * d, dtype=np.float32).reshape(n, d) / (n * d)
    return Graph(edges, num_nodes=n, node_feat={"h": feat})


def test_cycle_matches_hand_computation():
    n, d, hid, C = 8, 4, 6, 3
    g = _cycle_graph(n, d)
    sampler = NeighborSampler(g, samples=(3, 2))
    model = BipartiteSAGE(input_size=d, num_class=C, num_layers=2,
                          hidden_size=hid)
    feat = jnp.asarray(g.node_feat["h"])
    seeds = jnp.asarray([0, 5], dtype=jnp.int32)
    sampled, _ = sampler.sample(seeds, jax.random.key(0))
    params = model.init(jax.random.key(1), feat, seeds, sampled)
    out = model.apply(params, feat, seeds, sampled)
    assert out.shape == (2, C)

    # hand computation: in-neighbor of node v (dst) is src = v-1 mod n
    x = np.asarray(g.node_feat["h"])
    p = jax.tree.map(np.asarray, params)["params"]

    def dense(name, h):
        return h @ p[name]["kernel"] + p[name]["bias"]

    def l2(h):
        return h / np.maximum(np.linalg.norm(h, axis=-1, keepdims=True),
                              1e-12)

    def layer0(nodes):
        prev = (nodes - 1) % n
        h = dense("self_0", x[nodes]) + dense("neigh_0", x[prev])
        return l2(np.maximum(h, 0.0))

    seeds_np = np.array([0, 5])
    prev = (seeds_np - 1) % n
    expect = dense("self_1", layer0(seeds_np)) + dense("neigh_1",
                                                       layer0(prev))
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5,
                               atol=1e-5)


def test_single_jit_train_converges():
    n, C, D = 2000, 4, 32
    g, y = community_graph(num_nodes=n, num_classes=C, feat_dim=D,
                           avg_degree=10, seed=0)
    gt = g.tensor()
    sampler = NeighborSampler(gt, samples=(10, 10))
    model = BipartiteSAGE(input_size=D, num_class=C, num_layers=2,
                          hidden_size=64)
    feat = jnp.asarray(np.asarray(g.node_feat["h"]))
    y = jnp.asarray(y)
    opt = optax.adam(5e-3)
    B = 256

    seeds0 = jnp.arange(B, dtype=jnp.int32)
    sampled0, _ = sampler.sample(seeds0, jax.random.key(0))
    params = model.init(jax.random.key(1), feat, seeds0, sampled0)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, seeds, key):
        # sampling happens INSIDE the jitted step: no host round trip
        sampled, _ = sampler.sample(seeds, key)

        def loss_fn(p):
            logits = model.apply(p, feat, seeds, sampled)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y[seeds]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(2)
    rng = np.random.default_rng(0)
    for it in range(120):
        key, k1 = jax.random.split(key)
        seeds = jnp.asarray(rng.integers(0, n, B).astype(np.int32))
        params, opt_state, loss = step(params, opt_state, seeds, k1)

    # eval on fresh seeds with a held-out sampling key
    seeds = jnp.asarray(rng.integers(0, n, 512).astype(np.int32))
    sampled, _ = sampler.sample(seeds, jax.random.key(99))
    pred = model.apply(params, feat, seeds, sampled).argmax(-1)
    acc = float((pred == y[seeds]).mean())
    assert acc > 0.9, acc


def test_layer_count_mismatch_raises():
    g = _cycle_graph(8, 4)
    sampler = NeighborSampler(g, samples=(2,))
    model = BipartiteSAGE(input_size=4, num_class=2, num_layers=2)
    feat = jnp.asarray(g.node_feat["h"])
    seeds = jnp.asarray([0], dtype=jnp.int32)
    sampled, _ = sampler.sample(seeds, jax.random.key(0))
    with pytest.raises(ValueError, match="blocks"):
        model.init(jax.random.key(1), feat, seeds, sampled)


def test_packed_batch_round_trip():
    """pack=True collate + in-jit unpack reproduces the unpacked batch
    tuple exactly (one H2D buffer per batch instead of ~10)."""
    import jax.numpy as jnp
    from pgl_tpu.datasets import community_graph
    from pgl_tpu.sampling import make_padded_batch_fn, unpack_padded_batch
    g, y = community_graph(num_nodes=2000, num_classes=4, feat_dim=8,
                           avg_degree=8, seed=0)
    nb, eb = 1 << 11, 1 << 13
    bf = make_padded_batch_fn(g, (5, 5), nb, eb)
    bfp = make_padded_batch_fn(g, (5, 5), nb, eb, pack=True)
    items = [(n, y[n]) for n in range(64)]
    ref = bf(items)
    got = unpack_padded_batch(jnp.asarray(bfp(items)), nb, eb)
    for name, a, b in zip(("edges", "deg", "su", "sv", "se", "indptr",
                           "sidx", "smask", "y", "mask"), ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name
