"""Pallas kernel numerics in interpreter mode (the real-TPU path is
exercised by bench.py); parity against XLA segment ops on irregular degree
distributions including hubs and empty segments."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgl_tpu.ops.pallas.segment_kernels import sorted_segment_sum


def make_case(N, E, D, seed=0, hub=False):
    rng = np.random.default_rng(seed)
    if hub:
        # one node absorbs half the edges; many empty segments
        seg = np.concatenate([
            np.zeros(E // 2, np.int32),
            np.sort(rng.integers(N // 2, N, E - E // 2)).astype(np.int32)])
        seg = np.sort(seg)
    else:
        seg = np.sort(rng.integers(0, N, E)).astype(np.int32)
    msgs = rng.normal(size=(E, D)).astype(np.float32)
    deg = np.bincount(seg, minlength=N)
    indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    return jnp.asarray(msgs), jnp.asarray(seg), jnp.asarray(indptr)


@pytest.mark.parametrize("N,E,D,hub", [
    (100, 1000, 128, False),
    (1000, 5000, 256, False),
    (64, 2000, 128, True),       # hub node + empty segments
    (300, 77, 128, False),       # fewer edges than tile
])
def test_sorted_segment_sum_matches_xla(N, E, D, hub):
    msgs, seg, indptr = make_case(N, E, D, hub=hub)
    out = sorted_segment_sum(msgs, seg, indptr, N, 128, 256, True)
    ref = jax.ops.segment_sum(msgs, seg, num_segments=N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_gradient():
    msgs, seg, indptr = make_case(50, 400, 128, seed=3)
    w = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(50, 128)).astype(np.float32))

    def loss_pallas(m):
        return (sorted_segment_sum(m, seg, indptr, 50, 128, 256, True)
                * w).sum()

    def loss_xla(m):
        return (jax.ops.segment_sum(m, seg, num_segments=50) * w).sum()

    g1 = jax.grad(loss_pallas)(msgs)
    g2 = jax.grad(loss_xla)(msgs)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5)


def test_graph_integration_forced_pallas(monkeypatch):
    """Graph.send_u_recv with PGL_TPU_USE_PALLAS=1 (interpret-mode CPU run
    goes through the same code path XLA-side dispatch chooses on TPU)."""
    monkeypatch.setenv("PGL_TPU_USE_PALLAS", "0")  # CPU: XLA path
    from pgl_tpu import Graph
    rng = np.random.default_rng(0)
    g = Graph(rng.integers(0, 50, (5000, 2)), num_nodes=50,
              node_feat={"h": rng.normal(size=(50, 128)).astype(np.float32)})
    gt = g.tensor()
    out = gt.send_recv(gt.node_feat["h"], "sum")
    exp = np.zeros((50, 128), np.float32)
    h = np.asarray(g.node_feat["h"])
    for s, d in np.asarray(g.edges):
        exp[d] += h[s]
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-3, atol=1e-3)
