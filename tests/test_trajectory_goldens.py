"""Fixed-seed 20-step loss-trajectory regression goldens (VERDICT r2 #10).

The convergence tests only guard "learns at all"; these catch *silent
numeric drift* in optimizer/layer paths — a changed normalization, a
reordered reduction, an optimizer default — that still converges but no
longer matches. Goldens were generated on the CPU backend with fixed
seeds; regenerate by running this file directly
(``python tests/test_trajectory_goldens.py``) after an *intentional*
semantic change, and say why in the commit.

Mirrors the reference's behavior contract the only way available without
its datasets: exact repeatability of the training dynamics
(reference analog: the accuracy tables at
``examples/citation_benchmark/README.md:14-25``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from pgl_tpu.datasets import community_graph
from pgl_tpu.nn import GCNConv, GATConv, TransformerConv

# rtol for matching: loose enough for BLAS/XLA build differences, tight
# enough that any semantic change (normalization, init, lr schedule)
# explodes past it within 20 steps.
RTOL = 2e-3

GOLDENS = {}


def _graph():
    g, labels = community_graph(num_nodes=300, num_classes=3, feat_dim=16,
                                avg_degree=8, seed=5)
    return g.tensor(), jnp.asarray(labels)


def _run_conv(make_layers, steps=20, lr=1e-2, seed=0):
    gt, y = _graph()
    layers = make_layers()
    x = gt.node_feat["h"]
    params = []
    key = jax.random.key(seed)
    h = x
    for i, layer in enumerate(layers):
        key, sub = jax.random.split(key)
        p = layer.init(sub, gt, h)
        h = layer.apply(p, gt, h)
        params.append(p)
    params = tuple(params)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(params):
        h = x
        for p, layer in zip(params, layers):
            h = layer.apply(p, gt, h)
        return optax.softmax_cross_entropy_with_integer_labels(h, y).mean()

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    return np.asarray(losses)


def _traj_gcn():
    return _run_conv(lambda: [GCNConv(16, 24, activation="relu"),
                              GCNConv(24, 3)])


def _traj_gat():
    return _run_conv(lambda: [
        GATConv(input_size=16, hidden_size=8, num_heads=3,
                feat_drop=0.0, attn_drop=0.0),
        GATConv(input_size=24, hidden_size=3, num_heads=1,
                feat_drop=0.0, attn_drop=0.0)])


def _traj_unimp():
    return _run_conv(lambda: [
        TransformerConv(input_size=16, hidden_size=8, num_heads=3,
                        feat_drop=0.0, attn_drop=0.0),
        TransformerConv(input_size=24, hidden_size=3, num_heads=1,
                        feat_drop=0.0, attn_drop=0.0, concat=False)])


def _traj_kg():
    from pgl_tpu.models.kg import KGEModel, sample_negatives
    rng = np.random.default_rng(11)
    n_ent, n_rel, B = 200, 7, 64
    h = jnp.asarray(rng.integers(0, n_ent, B))
    r = jnp.asarray(rng.integers(0, n_rel, B))
    t = jnp.asarray(rng.integers(0, n_ent, B))
    model = KGEModel(n_ent, n_rel, 32, score="transe", seed=3)
    params = model.params
    opt = optax.adagrad(0.1)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, neg):
        loss, grads = jax.value_and_grad(model.loss_fn)(params, h, r, t,
                                                        neg)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(20):
        neg = jnp.asarray(
            np.random.default_rng(100 + i).integers(0, n_ent, 32))
        params, opt_state, loss = step(params, opt_state, neg)
        losses.append(float(loss))
    return np.asarray(losses)


TRAJ_FNS = {"gcn": _traj_gcn, "gat": _traj_gat, "unimp": _traj_unimp,
            "kg": _traj_kg}

# --- goldens (generated on jax CPU, seeds above) ---------------------------
GOLDENS = {
    # filled by running this file directly; see module docstring
}
GOLDENS_FILE = __file__.replace(".py", "_data.npz")


def _load_goldens():
    import os
    if not os.path.exists(GOLDENS_FILE):
        return None
    data = np.load(GOLDENS_FILE)
    return {k: data[k] for k in data.files}


@pytest.mark.parametrize("name", sorted(TRAJ_FNS))
def test_trajectory_matches_golden(name):
    goldens = _load_goldens()
    if goldens is None or name not in goldens:
        pytest.fail(f"golden for {name!r} missing — generate with "
                    f"`python {__file__}`")
    got = TRAJ_FNS[name]()
    want = goldens[name]
    np.testing.assert_allclose(
        got, want, rtol=RTOL,
        err_msg=(f"{name} loss trajectory drifted. If the semantic change "
                 f"was intentional, regenerate: python {__file__}"))
    # trajectories must also actually descend (guards a golden generated
    # from a broken state)
    assert got[-1] < got[0] * 0.9, got


if __name__ == "__main__":
    out = {}
    for name, fn in TRAJ_FNS.items():
        out[name] = fn()
        print(name, np.array2string(out[name], precision=5))
    np.savez(GOLDENS_FILE, **out)
    print("wrote", GOLDENS_FILE)
