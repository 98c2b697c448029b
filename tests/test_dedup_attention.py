"""Count-matrix (dedup) fused GAT attention — parity with the per-edge
softmax reference, including multi-edges, hubs, and empty rows
(reference triple: ``pgl/nn/conv.py:333-339`` + ``graph_op.py:101``)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pgl_tpu.ops.pallas import dedup_kernels as dk
from pgl_tpu.ops.pallas.dedup_attention import (dedup_gat_attention,
                                                build_uniq_reduce)


def _case(N, E, seed=0, hub=False, dups=0):
    rng = np.random.default_rng(seed)
    e = rng.integers(0, N, (E - dups, 2))
    if hub:
        e[: E // 3, 1] = 0                      # hub dst
        e[E // 3: E // 2, 0] = 1                # hub src
    edges = np.concatenate([e, e[:dups]]) if dups else e
    order = np.argsort(edges[:, 1], kind="stable")
    indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(edges[:, 1], minlength=N))])
    lay = dk.build_dedup_layout(indptr, edges[order][:, 0], N,
                                debug_rows=True)
    red = build_uniq_reduce(lay, N)
    return edges, lay, red


def _ref(edges, a_dst, a_src, v, N, H, DVH, leaky=0.2):
    src_e = jnp.asarray(edges[:, 0])
    dst_e = jnp.asarray(edges[:, 1])
    s = jax.nn.leaky_relu(a_dst[dst_e] + a_src[src_e], leaky)
    smax = jax.ops.segment_max(s, dst_e, num_segments=N)
    p = jnp.exp(s - smax[dst_e])
    denom = jax.ops.segment_sum(p, dst_e, num_segments=N)
    p = p / jnp.maximum(denom[dst_e], 1e-30)
    vv = v[:, :H * DVH][src_e].reshape(len(edges), H, DVH)
    o = jax.ops.segment_sum(p[:, :, None] * vv, dst_e, num_segments=N)
    return o.reshape(N, H * DVH)


@pytest.mark.parametrize("hub,dups", [(False, 0), (True, 0), (False, 64)])
def test_dedup_gat_forward_and_grads(hub, dups):
    N, E, H, DVH, DV = 800, 6000, 4, 8, 128
    edges, lay, red = _case(N, E, seed=1, hub=hub, dups=dups)
    rng = np.random.default_rng(2)
    a_dst = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(N, DV)).astype(np.float32))

    out = dedup_gat_attention(a_dst, a_src, v, lay, red, H, DVH, 0.2,
                              256, 1024, True)
    ref = _ref(edges, a_dst, a_src, v, N, H, DVH)
    np.testing.assert_allclose(np.asarray(out)[:, :H * DVH],
                               np.asarray(ref), rtol=1e-4, atol=1e-5)

    tgt = np.asarray(ref) * 0.9

    def loss_f(ad, as_, vv):
        o = dedup_gat_attention(ad, as_, vv, lay, red, H, DVH, 0.2,
                                256, 1024, True)
        return ((o[:, :H * DVH] - tgt) ** 2).sum()

    def loss_r(ad, as_, vv):
        return ((_ref(edges, ad, as_, vv, N, H, DVH) - tgt) ** 2).sum()

    g1 = jax.grad(loss_f, argnums=(0, 1, 2))(a_dst, a_src, v)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(a_dst, a_src, v)
    for a, b in zip(g1[:2], g2[:2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g1[2])[:, :H * DVH],
                               np.asarray(g2[2])[:, :H * DVH],
                               rtol=2e-3, atol=2e-4)


def test_empty_rows_produce_zeros():
    """Nodes with no incoming edges output zeros (reference contract)."""
    N, H, DVH, DV = 300, 2, 8, 128
    rng = np.random.default_rng(5)
    # all edges target the first 100 nodes
    edges = np.stack([rng.integers(0, N, 1500),
                      rng.integers(0, 100, 1500)], 1)
    order = np.argsort(edges[:, 1], kind="stable")
    indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(edges[:, 1], minlength=N))])
    lay = dk.build_dedup_layout(indptr, edges[order][:, 0], N,
                                debug_rows=True)
    red = build_uniq_reduce(lay, N)
    a_dst = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(N, DV)).astype(np.float32))
    out = np.asarray(dedup_gat_attention(a_dst, a_src, v, lay, red, H,
                                         DVH, 0.2, 256, 1024, True))
    assert np.all(out[100:] == 0.0)
    ref = _ref(edges, a_dst, a_src, v, N, H, DVH)
    np.testing.assert_allclose(out[:100, :H * DVH],
                               np.asarray(ref)[:100], rtol=1e-4,
                               atol=1e-5)


def test_gatconv_dispatches_dedup(monkeypatch):
    """GATConv picks the dedup attention path when the graph carries
    dedup layouts and dropout is off."""
    import flax  # noqa: F401
    from pgl_tpu import Graph
    from pgl_tpu.nn import GATConv
    import pgl_tpu.ops.pallas.dedup_attention as da
    import pgl_tpu.ops.dispatch as disp

    rng = np.random.default_rng(0)
    N, E = 600, 5000
    edges = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)], 1)
    g = Graph(edges, num_nodes=N).tensor()
    lays = g._spmm_layouts
    if lays[3] is None:   # too small for auto-dedup: build by hand
        csc_d = dk.build_dedup_layout(
            np.asarray(g.adj_dst_index.indptr),
            np.asarray(g.adj_dst_index.sorted_v), N)
        csr_d = dk.build_dedup_layout(
            np.asarray(g.adj_src_index.indptr),
            np.asarray(g.adj_src_index.sorted_v), N)
        red = build_uniq_reduce(csc_d, N)
        g._spmm_layouts = lays[:3] + (csc_d, csr_d, red)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(disp, "use_fused_attention",
                        lambda *a, **k: True)
    called = {}
    orig = da.dedup_gat_attention

    def spy(ad, as_, v, lay, red, H, dvh, leaky=0.2, nb=256, et=1024,
            interpret=False, attn_drop=0.0, drop_seed=None):
        called["yes"] = True
        return orig(ad, as_, v, lay, red, H, dvh, leaky, nb, et, True,
                    attn_drop, drop_seed)

    monkeypatch.setattr(da, "dedup_gat_attention", spy)
    conv = GATConv(input_size=16, hidden_size=8, num_heads=2,
                   feat_drop=0.0, attn_drop=0.0)
    x = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
    params = conv.init(jax.random.key(0), g, x)
    out = conv.apply(params, g, x)
    assert called.get("yes"), "dedup attention path not taken"
    assert np.isfinite(np.asarray(out)).all()


def _dot_ref(edges, q, k, v, N, H, DSH, DVH):
    src_e = jnp.asarray(edges[:, 0])
    dst_e = jnp.asarray(edges[:, 1])
    qh = q.reshape(N, H, DSH)
    kh = k.reshape(N, H, DSH)
    s = jnp.einsum("ehd,ehd->eh", qh[dst_e], kh[src_e])
    smax = jax.ops.segment_max(s, dst_e, num_segments=N)
    p = jnp.exp(s - smax[dst_e])
    denom = jax.ops.segment_sum(p, dst_e, num_segments=N)
    p = p / jnp.maximum(denom[dst_e], 1e-30)
    vv = v[:, :H * DVH][src_e].reshape(len(edges), H, DVH)
    o = jax.ops.segment_sum(p[:, :, None] * vv, dst_e, num_segments=N)
    return o.reshape(N, H * DVH)


def test_dedup_dot_forward_and_grads():
    from pgl_tpu.ops.pallas.dedup_attention import dedup_dot_attention
    N, E, H, DSH, DVH, DV = 700, 5000, 4, 8, 8, 128
    edges, lay, red = _case(N, E, seed=3, hub=True)
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(N, H * DSH)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(N, H * DSH)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(N, DV)).astype(np.float32))
    out = dedup_dot_attention(q, k, v, lay, red, H, DSH, DVH, 0.0,
                              256, 1024, True)
    ref = _dot_ref(edges, q, k, v, N, H, DSH, DVH)
    np.testing.assert_allclose(np.asarray(out)[:, :H * DVH],
                               np.asarray(ref), rtol=1e-4, atol=1e-4)
    tgt = np.asarray(ref) * 0.9

    def loss_f(qq, kk, vv):
        o = dedup_dot_attention(qq, kk, vv, lay, red, H, DSH, DVH, 0.0,
                                256, 1024, True)
        return ((o[:, :H * DVH] - tgt) ** 2).sum()

    def loss_r(qq, kk, vv):
        return ((_dot_ref(edges, qq, kk, vv, N, H, DSH, DVH) - tgt)
                ** 2).sum()

    g1 = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), g1, g2):
        aa, bb = np.asarray(a), np.asarray(b)
        if name == "dv":
            aa, bb = aa[:, :H * DVH], bb[:, :H * DVH]
        np.testing.assert_allclose(aa, bb, rtol=2e-3, atol=2e-4,
                                   err_msg=name)


def test_dedup_dot_wide_scores_backward():
    """H*DSH > 128 score width: the backward's dadst block is wider than
    one lane tile (regression: zeros block was hard-coded to 128 lanes)."""
    from pgl_tpu.ops.pallas.dedup_attention import dedup_dot_attention
    N, E, H, DSH, DVH, DV = 500, 4000, 4, 64, 8, 128
    edges, lay, red = _case(N, E, seed=6, hub=True)
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(N, H * DSH)).astype(np.float32) * 0.2)
    k = jnp.asarray(rng.normal(size=(N, H * DSH)).astype(np.float32) * 0.2)
    v = jnp.asarray(rng.normal(size=(N, DV)).astype(np.float32))
    ref = _dot_ref(edges, q, k, v, N, H, DSH, DVH)
    out = dedup_dot_attention(q, k, v, lay, red, H, DSH, DVH, 0.0,
                              256, 1024, True)
    np.testing.assert_allclose(np.asarray(out)[:, :H * DVH],
                               np.asarray(ref), rtol=1e-4, atol=1e-4)
    tgt = np.asarray(ref) * 0.9

    def loss_f(qq, kk, vv):
        o = dedup_dot_attention(qq, kk, vv, lay, red, H, DSH, DVH, 0.0,
                                256, 1024, True)
        return ((o[:, :H * DVH] - tgt) ** 2).sum()

    def loss_r(qq, kk, vv):
        return ((_dot_ref(edges, qq, kk, vv, N, H, DSH, DVH) - tgt)
                ** 2).sum()

    g1 = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), g1, g2):
        aa, bb = np.asarray(a), np.asarray(b)
        if name == "dv":
            aa, bb = aa[:, :H * DVH], bb[:, :H * DVH]
        np.testing.assert_allclose(aa, bb, rtol=2e-3, atol=3e-4,
                                   err_msg=name)


def test_dedup_gat_dvh_not_dividing_padded_width():
    """DVH that does not divide the lane-padded value width (H=2, DVH=24,
    DV=128): the backward's per-head delta must slice the real H*DVH
    columns before reshaping (regression: reshape(N, -1, dvh) crashed)."""
    N, E, H, DVH, DV = 400, 3000, 2, 24, 128
    edges, lay, red = _case(N, E, seed=8)
    rng = np.random.default_rng(9)
    a_dst = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(N, DV)).astype(np.float32))
    out = dedup_gat_attention(a_dst, a_src, v, lay, red, H, DVH, 0.2,
                              256, 1024, True)
    ref = _ref(edges, a_dst, a_src, v, N, H, DVH)
    np.testing.assert_allclose(np.asarray(out)[:, :H * DVH],
                               np.asarray(ref), rtol=1e-4, atol=1e-5)
    tgt = np.asarray(ref) * 0.9

    def loss_f(ad, as_, vv):
        o = dedup_gat_attention(ad, as_, vv, lay, red, H, DVH, 0.2,
                                256, 1024, True)
        return ((o[:, :H * DVH] - tgt) ** 2).sum()

    def loss_r(ad, as_, vv):
        return ((_ref(edges, ad, as_, vv, N, H, DVH) - tgt) ** 2).sum()

    g1 = jax.grad(loss_f, argnums=(0, 1, 2))(a_dst, a_src, v)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(a_dst, a_src, v)
    for a, b in zip(g1[:2], g2[:2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g1[2])[:, :H * DVH],
                               np.asarray(g2[2])[:, :H * DVH],
                               rtol=2e-3, atol=2e-4)


def _cell_idx_per_edge(lay):
    """Per-CSC-edge (dst, uniq-row) dropout key, replicating the
    kernel's ``_cell_idx`` int32 math from the layout's host aux."""
    dedup_pos = np.argsort(lay.eid)      # CSC pos -> dedup pos
    grow = np.asarray(lay.padded_rows)[:len(lay.eid)][dedup_pos]
    # dst in CSC order (eid sorts back to CSC edge positions)
    ids = np.asarray(lay.padded_ids).reshape(-1)[:len(lay.eid)][dedup_pos]
    idx = (ids.astype(np.int64) * -1640531535 + grow) & 0xFFFFFFFF
    idx[idx >= 1 << 31] -= 1 << 32
    return jnp.asarray(idx.astype(np.int32))


def test_dedup_gat_in_kernel_dropout_matches_masked_reference():
    """On a SIMPLE graph, per-cell dropout == per-edge dropout: fwd and
    grads must match the XLA composition with the replicated hash mask."""
    from pgl_tpu.ops.pallas.attention_kernels import _drop_keep
    N, E, H, DVH, DV, rate = 600, 4000, 4, 8, 128, 0.4
    rng = np.random.default_rng(31)
    # simple graph: unique (dst, src) pairs only
    pairs = rng.choice(N * N, E, replace=False)
    edges = np.stack([pairs % N, pairs // N], 1)
    order = np.argsort(edges[:, 1], kind="stable")
    indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(edges[:, 1], minlength=N))])
    lay = dk.build_dedup_layout(indptr, edges[order][:, 0], N,
                                debug_rows=True)
    assert lay.simple
    red = build_uniq_reduce(lay, N)
    edges_csc = edges[order]
    seed = jnp.int32(9876)
    a_dst = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(N, DV)).astype(np.float32))
    idx_e = _cell_idx_per_edge(lay)

    def ref(ad, as_, vv):
        src_e = jnp.asarray(edges_csc[:, 0])
        dst_e = jnp.asarray(edges_csc[:, 1])
        s = jax.nn.leaky_relu(ad[dst_e] + as_[src_e], 0.2)
        smax = jax.ops.segment_max(s, dst_e, num_segments=N)
        p = jnp.exp(s - smax[dst_e])
        denom = jax.ops.segment_sum(p, dst_e, num_segments=N)
        p = p / jnp.maximum(denom[dst_e], 1e-30)
        keep = jnp.stack([_drop_keep(idx_e, seed, h, rate)
                          for h in range(H)], axis=1)       # [E, H]
        p = jnp.where(keep, p, 0.0) / (1.0 - rate)
        ve = vv[:, :H * DVH][src_e].reshape(E, H, DVH)
        o = jax.ops.segment_sum(p[:, :, None] * ve, dst_e,
                                num_segments=N)
        return o.reshape(N, H * DVH)

    def fused(ad, as_, vv):
        return dedup_gat_attention(ad, as_, vv, lay, red, H, DVH, 0.2,
                                   256, 1024, True, rate, seed)

    out_f = np.asarray(fused(a_dst, a_src, v))[:, :H * DVH]
    out_r = np.asarray(ref(a_dst, a_src, v))
    np.testing.assert_allclose(out_f, out_r, rtol=1e-4, atol=1e-5)

    tgt = out_r * 0.9
    g1 = jax.grad(lambda *a: ((fused(*a)[:, :H * DVH] - tgt) ** 2).sum(),
                  argnums=(0, 1, 2))(a_dst, a_src, v)
    g2 = jax.grad(lambda *a: ((ref(*a) - tgt) ** 2).sum(),
                  argnums=(0, 1, 2))(a_dst, a_src, v)
    for nm, a, b in zip(("dadst", "dasrc", "dv"), g1, g2):
        aa, bb = np.asarray(a), np.asarray(b)
        if nm == "dv":
            aa = aa[:, :H * DVH]
            bb = bb[:, :H * DVH]
        np.testing.assert_allclose(aa, bb, rtol=2e-3, atol=3e-4,
                                   err_msg=nm)


def test_dedup_gat_dropout_rate0_matches_plain():
    edges, lay, red = _case(300, 2500, seed=40)
    rng = np.random.default_rng(41)
    a_dst = jnp.asarray(rng.normal(size=(300, 2)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(300, 2)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(300, 128)).astype(np.float32))
    o0 = dedup_gat_attention(a_dst, a_src, v, lay, red, 2, 8, 0.2,
                             256, 1024, True)
    o1 = dedup_gat_attention(a_dst, a_src, v, lay, red, 2, 8, 0.2,
                             256, 1024, True, 0.0, jnp.int32(5))
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


def test_dedup_dot_in_kernel_dropout_matches_masked_reference():
    """Dot-score (TransformerConv) mode with in-kernel dropout: the
    additive=False backward branch (masked dsc feeding the dq/dk
    contractions) must match the masked XLA composition."""
    from pgl_tpu.ops.pallas.dedup_attention import dedup_dot_attention
    from pgl_tpu.ops.pallas.attention_kernels import _drop_keep
    N, E, H, DSH, DVH, DV, rate = 500, 3500, 4, 8, 8, 128, 0.3
    rng = np.random.default_rng(51)
    pairs = rng.choice(N * N, E, replace=False)
    edges = np.stack([pairs % N, pairs // N], 1)
    order = np.argsort(edges[:, 1], kind="stable")
    indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(edges[:, 1], minlength=N))])
    lay = dk.build_dedup_layout(indptr, edges[order][:, 0], N,
                                debug_rows=True)
    assert lay.simple
    red = build_uniq_reduce(lay, N)
    edges_csc = edges[order]
    seed = jnp.int32(4242)
    q = jnp.asarray(rng.normal(size=(N, H * DSH)).astype(np.float32) * .3)
    k = jnp.asarray(rng.normal(size=(N, H * DSH)).astype(np.float32) * .3)
    v = jnp.asarray(rng.normal(size=(N, DV)).astype(np.float32))
    idx_e = _cell_idx_per_edge(lay)

    def ref(qq, kk, vv):
        src_e = jnp.asarray(edges_csc[:, 0])
        dst_e = jnp.asarray(edges_csc[:, 1])
        qh = qq.reshape(N, H, DSH)
        kh = kk.reshape(N, H, DSH)
        s = jnp.einsum("ehd,ehd->eh", qh[dst_e], kh[src_e])
        smax = jax.ops.segment_max(s, dst_e, num_segments=N)
        p = jnp.exp(s - smax[dst_e])
        denom = jax.ops.segment_sum(p, dst_e, num_segments=N)
        p = p / jnp.maximum(denom[dst_e], 1e-30)
        keep = jnp.stack([_drop_keep(idx_e, seed, h, rate)
                          for h in range(H)], axis=1)
        p = jnp.where(keep, p, 0.0) / (1.0 - rate)
        ve = vv[:, :H * DVH][src_e].reshape(E, H, DVH)
        o = jax.ops.segment_sum(p[:, :, None] * ve, dst_e,
                                num_segments=N)
        return o.reshape(N, H * DVH)

    def fused(qq, kk, vv):
        return dedup_dot_attention(qq, kk, vv, lay, red, H, DSH, DVH,
                                   0.0, 256, 1024, True, rate, seed)

    out_f = np.asarray(fused(q, k, v))[:, :H * DVH]
    out_r = np.asarray(ref(q, k, v))
    np.testing.assert_allclose(out_f, out_r, rtol=1e-4, atol=1e-5)

    tgt = out_r * 0.9
    g1 = jax.grad(lambda *a: ((fused(*a)[:, :H * DVH] - tgt) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: ((ref(*a) - tgt) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    for nm, a, b in zip(("dq", "dk", "dv"), g1, g2):
        aa, bb = np.asarray(a), np.asarray(b)
        if nm == "dv":
            aa = aa[:, :H * DVH]
            bb = bb[:, :H * DVH]
        np.testing.assert_allclose(aa, bb, rtol=2e-3, atol=3e-4,
                                   err_msg=nm)


def test_multigraph_cell_dropout_expectation_parity():
    """attn_drop_mode="cell" on a MULTIgraph: per-(dst, src)-cell dropout
    matches per-edge dropout IN EXPECTATION (the output is linear in the
    keep mask and the softmax denominator is undropped, reference
    semantics ``pgl/nn/conv.py:334-339``), with positive variance (it is
    really dropping)."""
    N, E, H, DVH = 96, 800, 2, 8
    edges, lay, red = _case(N, E, seed=3, dups=200)
    assert not lay.simple
    rng = np.random.default_rng(0)
    a_dst = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
    rate = 0.5

    undropped = np.asarray(dedup_gat_attention(
        a_dst, a_src, v, lay, red, H, DVH, 0.2, 256, 1024, True))

    outs = []
    for seed in range(200):
        outs.append(np.asarray(dedup_gat_attention(
            a_dst, a_src, v, lay, red, H, DVH, 0.2, 256, 1024, True,
            attn_drop=rate, drop_seed=seed)))
    outs = np.stack(outs)
    mean = outs.mean(0)
    # E[out] == undropped out (cell mask is unbiased); CLT tolerance
    scale = np.abs(undropped).max()
    assert np.abs(mean - undropped).max() < 0.15 * scale
    # and it is actually dropping: per-seed deviation is substantial
    assert np.abs(outs[0] - undropped).max() > 0.05 * scale


def test_gatconv_cell_mode_takes_fast_path_on_multigraph():
    """GATConv(attn_drop_mode="cell") keeps the count-matrix path on a
    multigraph with dropout; default mode falls back (documented
    contract)."""
    import flax.linen as fnn
    from pgl_tpu import Graph
    from pgl_tpu.nn import GATConv
    rng = np.random.default_rng(1)
    e = rng.integers(0, 128, (600, 2))
    e = np.concatenate([e, e[:150]])            # multigraph
    g = Graph(e, num_nodes=128,
              node_feat={"h": rng.normal(size=(128, 16)
                                         ).astype(np.float32)})
    g = g.tensor()
    for mode in ("edge", "cell"):
        conv = GATConv(input_size=16, hidden_size=8, num_heads=2,
                       feat_drop=0.0, attn_drop=0.3, attn_drop_mode=mode)
        p = conv.init({"params": jax.random.key(0),
                       "dropout": jax.random.key(1)},
                      g, g.node_feat["h"], True)
        out = conv.apply(p, g, g.node_feat["h"], True,
                         rngs={"dropout": jax.random.key(2)})
        assert np.isfinite(np.asarray(out)).all()
