"""Model-assembly smoke tests: every standard-signature model in
``pgl_tpu.models`` must init, forward, and take one finite gradient step
on a small graph (the citation-benchmark contract)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from pgl_tpu import Graph
from pgl_tpu import models as M
from pgl_tpu.utils.transform import add_self_loops, to_undirected

STANDARD_MODELS = ["GCN", "GAT", "GATv2", "GraphSage", "GIN", "DeepGCNII",
                   "APPNPModel", "SGC", "SSGC", "GPRGNN", "FAGCN",
                   "BernNet", "ChebNetII"]


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    n = 60
    edges = rng.integers(0, n, (300, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    g = add_self_loops(to_undirected(Graph(edges, num_nodes=n)))
    gt = g.tensor()
    x = jnp.asarray(rng.normal(size=(n, 12)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, n))
    return gt, x, y


@pytest.mark.parametrize("name", STANDARD_MODELS)
def test_model_trains(name, data):
    gt, x, y = data
    model = getattr(M, name)(input_size=12, num_class=3)
    params = model.init(jax.random.key(0), gt, x)
    logits = model.apply(params, gt, x)
    # GIN is a graph-classification assembly: it pools to one row per graph
    rows = gt.num_graph if name == "GIN" else gt.num_nodes
    assert logits.shape == (rows, 3)
    assert bool(jnp.isfinite(logits).all())

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    yy = y[:1] if name == "GIN" else y

    def loss_fn(p):
        out = model.apply(p, gt, x, training=True,
                          rngs={"dropout": jax.random.key(1)})
        return optax.softmax_cross_entropy_with_integer_labels(
            out, yy).mean()

    l0, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = opt.update(grads, opt_state)
    params = optax.apply_updates(params, updates)
    l1 = loss_fn(params)
    assert bool(jnp.isfinite(l0)) and bool(jnp.isfinite(l1))
    # at least one parameter actually moved
    flat = jax.tree_util.tree_leaves(grads)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_remat_stacks_parity():
    """remat=True (per-layer jax.checkpoint) is numerically identical to
    the plain stacks, forward and gradients — it only trades recompute
    for activation memory."""
    import jax
    import numpy as np
    from pgl_tpu.datasets import powerlaw_graph
    from pgl_tpu.models import GCN, GraphSage, DeepGCNII

    g = powerlaw_graph(num_nodes=128, avg_degree=6, feat_dim=8,
                       seed=0).tensor()
    x = g.node_feat["h"]
    for cls, kw in [(GCN, dict(num_layers=3, hidden_size=8)),
                    (GraphSage, dict(num_layers=2, hidden_size=8)),
                    (DeepGCNII, dict(hidden_size=8, k_hop=3, dropout=0.0))]:
        m0 = cls(input_size=8, num_class=4, **kw)
        m1 = cls(input_size=8, num_class=4, remat=True, **kw)
        p = m0.init(jax.random.key(0), g, x)
        np.testing.assert_array_equal(np.asarray(m0.apply(p, g, x)),
                                      np.asarray(m1.apply(p, g, x)))
        g0 = jax.grad(lambda p: (m0.apply(p, g, x) ** 2).sum())(p)
        g1 = jax.grad(lambda p: (m1.apply(p, g, x) ** 2).sum())(p)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_label_propagation_smooth():
    """Post-smoothing (R-UniMP trick): pinned-label propagation improves
    noisy base predictions on a community graph, and the halo-sharded
    run matches single-device exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh
    from pgl_tpu.datasets import community_graph
    from pgl_tpu.parallel import HaloGraph
    from pgl_tpu.models import label_propagation_smooth

    g, labels = community_graph(num_nodes=240, num_classes=3, feat_dim=4,
                                avg_degree=10, seed=2)
    N, C = 240, 3
    rng = np.random.default_rng(0)
    gold = np.eye(C, dtype=np.float32)[np.asarray(labels)]
    # noisy base predictions: correct signal + heavy noise
    probs = gold * 0.4 + rng.random((N, C)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    train = np.zeros(N, np.float32)
    train[rng.choice(N, N // 3, replace=False)] = 1.0
    test = train < 0.5

    gt = g.tensor()
    sm = label_propagation_smooth(gt, jnp.asarray(probs),
                                  jnp.asarray(gold), jnp.asarray(train))
    acc0 = (probs.argmax(-1) == np.asarray(labels))[test].mean()
    acc1 = (np.asarray(sm).argmax(-1) == np.asarray(labels))[test].mean()
    assert acc1 > acc0 + 0.1, (acc0, acc1)

    mesh = Mesh(np.array(jax.devices()), ("node",))
    hg = HaloGraph.from_graph(g, mesh)
    sm_h = label_propagation_smooth(
        hg, hg.shard_node_values(probs), hg.shard_node_values(gold),
        hg.shard_node_values(train))
    np.testing.assert_allclose(
        np.asarray(hg.unshard_node_values(sm_h)), np.asarray(sm),
        rtol=1e-5, atol=1e-6)
