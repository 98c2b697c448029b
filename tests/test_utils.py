"""Config, export/serving, profiler, sharded embedding tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgl_tpu.utils.config import Config, load_config
from pgl_tpu.utils.export import export_model, Predictor
from pgl_tpu.utils.profiler import StageTimer


def test_config_basic(tmp_path):
    cfg = Config({"model": {"hidden": 64}, "lr": 0.01})
    assert cfg.model.hidden == 64
    assert cfg.lr == 0.01
    assert cfg.missing is None
    cfg2 = cfg.merge({"model": {"heads": 4}})
    assert cfg2.model.hidden == 64 and cfg2.model.heads == 4
    cfg3 = cfg.override("model.hidden", 128)
    assert cfg3.model.hidden == 128 and cfg.model.hidden == 64
    p = tmp_path / "c.yaml"
    cfg.save(str(p))
    loaded = load_config(str(p))
    assert loaded.model.hidden == 64


def test_export_roundtrip(tmp_path):
    from pgl_tpu import Graph
    from pgl_tpu.models import GCN

    rng = np.random.default_rng(0)
    g = Graph(rng.integers(0, 20, (60, 2)), num_nodes=20,
              node_feat={"h": rng.normal(size=(20, 8)).astype(np.float32)})
    gt = g.tensor()
    model = GCN(input_size=8, num_class=3, hidden_size=8, dropout=0.0)
    params = model.init(jax.random.key(0), gt, gt.node_feat["h"])

    def infer(x):
        return model.apply(params, gt, x)

    path = str(tmp_path / "model.bin")
    export_model(infer, [gt.node_feat["h"]], path)
    assert os.path.getsize(path) > 0

    pred = Predictor(path)
    out = pred.run(gt.node_feat["h"])
    ref = infer(gt.node_feat["h"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_stage_timer(caplog):
    timer = StageTimer()
    with timer.stage("a"):
        x = jnp.ones((10,)) * 2
    with timer.stage("a", sync_value=x):
        x = x + 1
    totals = timer.report()
    assert totals["a"] > 0


def test_sharded_embedding():
    from jax.sharding import Mesh
    from pgl_tpu.parallel.embedding import ShardedEmbedding

    mesh = Mesh(np.array(jax.devices()), ("data",))
    emb = ShardedEmbedding(100, 16, mesh, axis="data", seed=0)
    ids = jnp.asarray([3, 50, 99])
    rows = emb.lookup(ids)
    assert rows.shape == (3, 16)
    before = np.asarray(rows)
    emb.apply_sparse_grad(ids, jnp.ones((3, 16)), lr=0.5)
    after = np.asarray(emb.lookup(ids))
    np.testing.assert_allclose(after, before - 0.5, rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    import optax
    from pgl_tpu.utils.checkpoint import (CheckpointManager, save_pytree,
                                          load_pytree)
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    p = str(tmp_path / "one")
    save_pytree(p, params)
    back = load_pytree(p)
    np.testing.assert_allclose(np.asarray(back["w"]),
                               np.asarray(params["w"]))

    mgr = CheckpointManager(str(tmp_path / "mgr"), max_to_keep=2)
    for step in (1, 2, 3):
        mgr.save(step, {"params": jax.tree.map(lambda x: x * step, params),
                        "step": step})
    assert mgr.latest_step() == 3
    assert sorted(mgr.all_steps()) == [2, 3]  # retention dropped step 1
    state = mgr.restore()
    assert int(state["step"]) == 3
    np.testing.assert_allclose(np.asarray(state["params"]["b"]),
                               3 * np.ones(3))
    mgr.close()


def test_amp_bf16_training_converges():
    """bf16 params/activations with f32 master weights still learn."""
    import optax
    from pgl_tpu.utils.amp import to_bf16, to_f32, bf16_params_policy
    from pgl_tpu import Graph
    from pgl_tpu.datasets import community_graph
    from pgl_tpu.models import GCN

    g, y = community_graph(num_nodes=200, num_classes=3, feat_dim=16,
                           avg_degree=6, seed=0)
    gt = g.tensor()
    x = to_bf16(gt.node_feat["h"])
    yj = jnp.asarray(y)
    model = GCN(input_size=16, num_class=3, hidden_size=16, dropout=0.0)
    params = model.init(jax.random.key(0), gt, x)
    assert params["params"]["gcn_0"]["linear"]["kernel"].dtype == jnp.float32
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    def loss_fn(p):
        logits = model.apply(p, gt, x).astype(jnp.float32)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, yj).mean()

    grad_fn = bf16_params_policy(jax.value_and_grad(loss_fn))

    @jax.jit
    def step(params, opt_state):
        loss, grads = grad_fn(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


def test_checkpoint_sharded_halo_state(tmp_path):
    """Checkpointing mesh-sharded training state: sharded arrays save and
    restore with their shardings (restore with a target), so halo-sharded
    training resumes without a gather to host."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from pgl_tpu.utils.checkpoint import save_pytree, load_pytree

    mesh = Mesh(np.array(jax.devices()), ("node",))
    sh = NamedSharding(mesh, P("node", None))
    x = jax.device_put(np.arange(64, dtype=np.float32).reshape(8, 8), sh)
    state = {"params": {"w": x}, "step": jnp.asarray(7)}
    save_pytree(str(tmp_path / "ck"), state)

    zeros = jax.device_put(np.zeros((8, 8), np.float32), sh)
    target = {"params": {"w": zeros}, "step": jnp.asarray(0)}
    got = load_pytree(str(tmp_path / "ck"), target)
    np.testing.assert_array_equal(np.asarray(got["params"]["w"]),
                                  np.asarray(x))
    assert int(got["step"]) == 7
    assert got["params"]["w"].sharding == sh


def test_export_halo_sharded_inference(tmp_path):
    """A halo-sharded inference function exports to a portable artifact
    (collectives included) and serves through Predictor with the sharded
    input layout preserved."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh
    from pgl_tpu import Graph
    from pgl_tpu.parallel import HaloGraph
    from pgl_tpu.utils.export import export_model, Predictor
    import pgl_tpu.nn as gnn

    rng = np.random.default_rng(0)
    g = Graph(rng.integers(0, 64, (200, 2)), num_nodes=64,
              node_feat={"h": rng.normal(size=(64, 8)).astype(np.float32)})
    mesh = Mesh(np.array(jax.devices()), ("node",))
    hg = HaloGraph.from_graph(g, mesh)
    x = hg.shard_node_values(np.asarray(g.node_feat["h"]))
    layer = gnn.GCNConv(input_size=8, output_size=4)
    params = layer.init(jax.random.key(0), hg, x)

    def infer(x):
        return layer.apply(params, hg, x)

    path = str(tmp_path / "halo_model.bin")
    export_model(infer, (x,), path)
    pred = Predictor(path)
    out = pred.run(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(infer(x)),
                               rtol=1e-5, atol=1e-6)


def test_bf16_mixed_precision_training():
    """utils.amp recipe end-to-end: bf16 params/activations in the loss,
    f32 master weights at the optimizer — training converges and master
    params remain f32."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from pgl_tpu.datasets import community_graph
    from pgl_tpu.models import GCN
    from pgl_tpu.utils import amp

    g, labels = community_graph(num_nodes=200, num_classes=2, feat_dim=8,
                                avg_degree=10, seed=1)
    gt = g.tensor()
    x = gt.node_feat["h"]
    y = jnp.asarray(np.asarray(labels))
    model = GCN(input_size=8, num_class=2, num_layers=2, hidden_size=16,
                dropout=0.0)
    params = model.init(jax.random.key(0), gt, x)
    opt = optax.adam(1e-2)
    ost = opt.init(params)

    def loss_fn(p):
        logits = model.apply(p, gt, amp.to_bf16(x))
        return optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), y).mean()

    grad_fn = amp.bf16_params_policy(jax.value_and_grad(loss_fn))

    @jax.jit
    def step(params, ost):
        loss, grads = grad_fn(params)
        upd, ost = opt.update(grads, ost)
        return optax.apply_updates(params, upd), ost, loss

    l0 = None
    for _ in range(60):
        params, ost, loss = step(params, ost)
        if l0 is None:
            l0 = float(loss)
    assert l0 / float(loss) > 3, (l0, float(loss))
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32
    acc = float((np.asarray(jnp.argmax(
        model.apply(params, gt, x), -1)) == np.asarray(labels)).mean())
    assert acc > 0.9, acc


def test_softmax_cross_entropy_integer_matches_optax():
    """Gather-free CE: same values and grads as the optax reference."""
    import optax
    import jax
    import jax.numpy as jnp
    from pgl_tpu.ops import softmax_cross_entropy_integer

    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(257, 11)).astype(np.float32) * 3)
    y = jnp.asarray(rng.integers(0, 11, 257).astype(np.int32))
    ours = softmax_cross_entropy_integer(logits, y)
    ref = optax.softmax_cross_entropy_with_integer_labels(logits, y)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    g1 = jax.grad(lambda x: softmax_cross_entropy_integer(x, y).sum())(
        logits)
    g2 = jax.grad(
        lambda x: optax.softmax_cross_entropy_with_integer_labels(
            x, y).sum())(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)
