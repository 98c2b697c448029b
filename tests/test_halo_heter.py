"""HaloHeterGraph — per-relation halo partitions over one shared node
assignment (reference contrast: the multi-GPU hetero path replicates the
node tensor; ``pgl/nn/conv.py:1014-1023`` R-GCN loop,
``examples/kddcup2021/MAG240M/r_unimp`` relation-wise attention)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pgl_tpu import HeterGraph
from pgl_tpu.parallel import HaloHeterGraph

N, D = 41, 8
rng = np.random.default_rng(5)
EDGES = {"cites": rng.integers(0, N, (60, 2)),
         "writes": rng.integers(0, N, (45, 2))}
FEAT = rng.normal(size=(N, D)).astype(np.float32)


@pytest.fixture(scope="module")
def graphs():
    hg = HeterGraph(EDGES, num_nodes=N, node_feat={"h": FEAT})
    mesh = Mesh(np.array(jax.devices()), ("node",))
    hhg = HaloHeterGraph.from_heter_graph(hg, mesh)
    return hg.tensor(), hhg


def test_shared_node_layout(graphs):
    """All relations share one ownership assignment: features shard once
    and round-trip; per-etype node_perm arrays are identical."""
    _, hhg = graphs
    x = hhg.shard_node_values(FEAT)
    np.testing.assert_allclose(hhg.unshard_node_values(x), FEAT)
    perms = [np.asarray(hhg[t].node_perm) for t in hhg.edge_types]
    np.testing.assert_array_equal(perms[0], perms[1])


def test_rgcn_parity(graphs):
    from pgl_tpu.nn import RGCNConv
    hgt, hhg = graphs
    layer = RGCNConv(in_dim=D, out_dim=6, etypes=["cites", "writes"],
                     num_bases=2)
    x = hhg.shard_node_values(FEAT)
    params = layer.init(jax.random.key(0), hhg, x)
    o_h = hhg.unshard_node_values(layer.apply(params, hhg, x))
    o_1 = layer.apply(params, hgt, hgt.node_feat["h"])
    np.testing.assert_allclose(np.asarray(o_h), np.asarray(o_1),
                               rtol=1e-4, atol=1e-5)


def test_runimp_parity_and_grads(graphs):
    """Relation-wise UniMP (per-etype dot attention + label embedding)
    matches single-device forward and gradients on the hetero halo."""
    from pgl_tpu.models import RUniMP
    hgt, hhg = graphs
    model = RUniMP(input_size=D, num_class=3, etypes=["cites", "writes"],
                   num_layers=2, hidden_size=4, num_heads=2, dropout=0.0)
    lab = rng.integers(0, 3, N)
    msk = rng.random(N) < 0.5
    x = hhg.shard_node_values(FEAT)
    lab_h = hhg.shard_node_values(lab).astype(jnp.int32)
    msk_h = hhg.shard_node_values(msk.astype(np.float32)) > 0.5
    params = model.init(jax.random.key(1), hhg, x, lab_h, msk_h)
    o_h = hhg.unshard_node_values(
        model.apply(params, hhg, x, lab_h, msk_h))
    o_1 = model.apply(params, hgt, hgt.node_feat["h"], jnp.asarray(lab),
                      jnp.asarray(msk))
    np.testing.assert_allclose(np.asarray(o_h), np.asarray(o_1),
                               rtol=1e-4, atol=1e-5)

    g_h = jax.grad(lambda p: (model.apply(
        p, hhg, x, lab_h, msk_h) ** 2).sum())(params)
    g_1 = jax.grad(lambda p: (model.apply(
        p, hgt, hgt.node_feat["h"], jnp.asarray(lab),
        jnp.asarray(msk)) ** 2).sum())(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_h),
                    jax.tree_util.tree_leaves(g_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_pytree_jit_argument(graphs):
    """HaloHeterGraph passes as a jit argument (pytree), keeping index
    arrays out of the compiled program's constants."""
    _, hhg = graphs
    x = hhg.shard_node_values(FEAT)

    @jax.jit
    def f(hhg, x):
        return hhg["cites"].send_recv(x, "sum").sum()

    assert np.isfinite(float(f(hhg, x)))


def test_heter_save_load_round_trip(graphs, tmp_path):
    """Persisted hetero partitions reload without re-partitioning; RGCN
    output matches the freshly built graphs."""
    from pgl_tpu.nn import RGCNConv
    hgt, hhg = graphs
    d = str(tmp_path / "hetero")
    hhg.save(d)
    mesh2 = Mesh(np.array(jax.devices()), ("node",))
    hhg2 = HaloHeterGraph.load(d, mesh2)
    assert sorted(hhg2.edge_types) == sorted(hhg.edge_types)
    assert hhg2.halo_size == hhg.halo_size
    layer = RGCNConv(in_dim=D, out_dim=5, etypes=["cites", "writes"])
    x = hhg2.shard_node_values(FEAT)
    params = layer.init(jax.random.key(0), hhg2, x)
    np.testing.assert_allclose(
        np.asarray(hhg2.unshard_node_values(layer.apply(params, hhg2, x))),
        np.asarray(hhg.unshard_node_values(
            layer.apply(params, hhg, hhg.shard_node_values(FEAT)))),
        rtol=1e-5, atol=1e-6)
