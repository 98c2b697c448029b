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


def make_attention_case(N, E, H, dsh, dvh, seed=0):
    from pgl_tpu.ops.pallas.segment_kernels import build_blocked_layout
    rng = np.random.default_rng(seed)
    dst = np.sort(rng.integers(0, N, E)).astype(np.int64)
    src = rng.integers(0, N, E).astype(np.int64)
    indptr = np.concatenate([[0], np.cumsum(np.bincount(dst, minlength=N))])
    layout = build_blocked_layout(indptr, src, N)
    q = jnp.asarray(rng.normal(size=(N, H * dsh)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(N, H * dsh)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(N, H * dvh)).astype(np.float32))
    return layout, q, k, v, jnp.asarray(src), jnp.asarray(dst)


@pytest.mark.parametrize("H,leaky", [(1, 0.0), (2, 0.0), (2, 0.2)])
def test_fused_attention_matches_xla(H, leaky):
    from pgl_tpu.ops.pallas.attention_kernels import (fused_graph_attention,
                                                      _xla_reference)
    layout, q, k, v, src, dst = make_attention_case(200, 3000, H,
                                                    128 // H, 128 // H)
    out = fused_graph_attention(q, k, v, layout, None, H, leaky, 128, 256, True)
    ref = _xla_reference(q, k, v, src, dst, 200, H, leaky)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_attention_gat_mode_padded_heads():
    """GAT additive scores via augmented q/k, value width padded to 128."""
    from pgl_tpu.ops.pallas.attention_kernels import (fused_graph_attention,
                                                      _xla_reference,
                                                      gat_score_features)
    N, E, H, Dh = 150, 2000, 8, 8
    layout, _, _, _, src, dst = make_attention_case(N, E, H, 16, 16)
    rng = np.random.default_rng(1)
    a_dst = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    q, k = gat_score_features(a_dst, a_src)
    v = jnp.zeros((N, 128)).at[:, :H * Dh].set(
        jnp.asarray(rng.normal(size=(N, H * Dh)).astype(np.float32)))
    out = fused_graph_attention(q, k, v, layout, None, H, 0.2, 128, 256,
                                True, q.shape[1] // H, Dh)
    ref = _xla_reference(q, k, v, src, dst, N, H, 0.2, q.shape[1] // H, Dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_attention_grad():
    from pgl_tpu.ops.pallas.attention_kernels import (fused_graph_attention,
                                                      _xla_reference)
    layout, q, k, v, src, dst = make_attention_case(100, 1500, 2, 64, 64)

    def loss_fused(q, k, v):
        return (fused_graph_attention(q, k, v, layout, None, 2, 0.0, 128,
                                      256, True) ** 2).sum()

    def loss_ref(q, k, v):
        return (_xla_reference(q, k, v, src, dst, 100, 2, 0.0) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_weighted_spmm_matches_xla():
    from pgl_tpu.ops.pallas.segment_kernels import (build_blocked_layout,
                                                    spmm_weighted)
    rng = np.random.default_rng(5)
    N, E, D = 150, 3000, 128
    dst = np.sort(rng.integers(0, N, E)).astype(np.int64)
    src = rng.integers(0, N, E).astype(np.int64)
    indptr = np.concatenate([[0], np.cumsum(np.bincount(dst, minlength=N))])
    csc = build_blocked_layout(indptr, src, N, 128, 256)
    order = np.argsort(src, kind="stable")
    indptr_s = np.concatenate([[0],
                               np.cumsum(np.bincount(src, minlength=N))])
    csr = build_blocked_layout(indptr_s, dst[order], N, 128, 256)
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    w = rng.normal(size=(E,)).astype(np.float32)
    w_csc = np.zeros(len(np.asarray(csc.padded_v)), np.float32)
    w_csc[:E] = w
    w_csr = np.zeros(len(np.asarray(csr.padded_v)), np.float32)
    w_csr[:E] = w[order]
    out = spmm_weighted(x, jnp.asarray(w_csc), jnp.asarray(w_csr), csc,
                        csr, 128, 256, True)
    ref = jax.ops.segment_sum(
        jnp.take(x, jnp.asarray(src), axis=0) * jnp.asarray(w)[:, None],
        jnp.asarray(dst), num_segments=N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)

    gx1, gw1 = jax.grad(
        lambda x, wc: (spmm_weighted(x, wc, jnp.asarray(w_csr), csc, csr,
                                     128, 256, True) ** 2).sum(),
        argnums=(0, 1))(x, jnp.asarray(w_csc))
    gx2, gw2 = jax.grad(
        lambda x, w_: (jax.ops.segment_sum(
            jnp.take(x, jnp.asarray(src), axis=0) * w_[:, None],
            jnp.asarray(dst), num_segments=N) ** 2).sum(),
        argnums=(0, 1))(x, jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1[:E]), np.asarray(gw2),
                               rtol=1e-4, atol=1e-4)


def test_layout_block_size_mismatch_raises():
    from pgl_tpu.ops.pallas.segment_kernels import (build_blocked_layout,
                                                    spmm)
    rng = np.random.default_rng(0)
    N, E = 1000, 5000
    dst = np.sort(rng.integers(0, N, E)).astype(np.int64)
    src = rng.integers(0, N, E).astype(np.int64)
    indptr = np.concatenate([[0], np.cumsum(np.bincount(dst, minlength=N))])
    lay = build_blocked_layout(indptr, src, N, 256, 1024)
    x = jnp.ones((N, 128))
    with pytest.raises(ValueError, match="different row-block size"):
        spmm(x, lay, lay, 128, 256, True)


def test_fused_attention_analytical_bwd():
    """Flash-style backward (weighted-SpMM based) matches XLA autodiff."""
    from pgl_tpu.ops.pallas.attention_kernels import (fused_graph_attention,
                                                      _xla_reference)
    from pgl_tpu.ops.pallas.segment_kernels import build_blocked_layout
    rng = np.random.default_rng(2)
    N, E, H, DSH, DVH = 200, 3000, 2, 64, 64
    dst = np.sort(rng.integers(0, N, E)).astype(np.int64)
    src = rng.integers(0, N, E).astype(np.int64)
    indptr = np.concatenate([[0], np.cumsum(np.bincount(dst, minlength=N))])
    csc = build_blocked_layout(indptr, src, N, 128, 256)
    order = np.argsort(src, kind="stable")
    indptr_s = np.concatenate([[0],
                               np.cumsum(np.bincount(src, minlength=N))])
    csr = build_blocked_layout(indptr_s, dst[order], N, 128, 256)
    # perm[csr_pos] = csc position of that edge (csc order == orig here)
    perm = jnp.asarray(order.astype(np.int32))
    q = jnp.asarray(rng.normal(size=(N, H * DSH)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(N, H * DSH)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(N, H * DVH)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(N, H * DVH)).astype(np.float32))

    for leaky in (0.0, 0.2):
        def loss_fused(q, k, v):
            return ((fused_graph_attention(q, k, v, csc, (csr, perm), H,
                                           leaky, 128, 256, True)
                     - tgt) ** 2).sum()

        def loss_ref(q, k, v):
            return ((_xla_reference(q, k, v, jnp.asarray(src),
                                    jnp.asarray(dst), N, H, leaky)
                     - tgt) ** 2).sum()

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4)


def test_fused_attention_analytical_bwd_narrow_heads():
    """Analytical backward with H*DVH < 128 (the GAT second-layer shape)."""
    from pgl_tpu.ops.pallas.attention_kernels import (fused_graph_attention,
                                                      _xla_reference)
    from pgl_tpu.ops.pallas.segment_kernels import build_blocked_layout
    rng = np.random.default_rng(4)
    N, E, H, DSH, DVH = 120, 2000, 1, 128, 16
    dst = np.sort(rng.integers(0, N, E)).astype(np.int64)
    src = rng.integers(0, N, E).astype(np.int64)
    indptr = np.concatenate([[0], np.cumsum(np.bincount(dst, minlength=N))])
    csc = build_blocked_layout(indptr, src, N, 128, 256)
    order = np.argsort(src, kind="stable")
    indptr_s = np.concatenate([[0],
                               np.cumsum(np.bincount(src, minlength=N))])
    csr = build_blocked_layout(indptr_s, dst[order], N, 128, 256)
    perm = jnp.asarray(order.astype(np.int32))
    q = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32)) * 0.3
    v = jnp.zeros((N, 128)).at[:, :DVH].set(
        jnp.asarray(rng.normal(size=(N, DVH)).astype(np.float32)))

    def loss_fused(q, k, v):
        return (fused_graph_attention(q, k, v, csc, (csr, perm), H, 0.2,
                                      128, 256, True, DSH, DVH) ** 2).sum()

    def loss_ref(q, k, v):
        return (_xla_reference(q, k, v, jnp.asarray(src), jnp.asarray(dst),
                               N, H, 0.2, DSH, DVH) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_fused_gather_matches_base_and_toggle(monkeypatch):
    """The fused-gather SpMM (default) must match the gather-then-reduce
    kernel exactly, forward and backward, and PGL_TPU_FUSED_GATHER=0 must
    fall back."""
    from pgl_tpu.ops.pallas.segment_kernels import (
        build_blocked_layout, _blocked_spmm, _blocked_spmm_fused, spmm)

    rng = np.random.default_rng(1)
    N, E, D = 900, 7000, 128
    dst = np.sort(rng.integers(0, N, E))
    src = rng.integers(0, N, E)
    indptr = np.cumsum(np.concatenate(
        [[0], np.bincount(dst, minlength=N)]))
    csc = build_blocked_layout(indptr, src, N)
    order = np.argsort(src, kind="stable")
    indptr_r = np.cumsum(np.concatenate(
        [[0], np.bincount(src, minlength=N)]))
    csr = build_blocked_layout(indptr_r, dst[order], N)
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))

    base = _blocked_spmm(x, csc.padded_v, csc.padded_ids, csc.tile_starts,
                         csc.tile_ends, N, 256, 1024, True)
    fused = _blocked_spmm_fused(x, csc.padded_v, csc.padded_ids,
                                csc.tile_starts, csc.tile_ends, N, 256,
                                1024, True)
    np.testing.assert_allclose(np.asarray(base), np.asarray(fused),
                               rtol=0, atol=0)

    def loss(x):
        return (spmm(x, csc, csr, 256, 1024, True) ** 2).sum()

    monkeypatch.setenv("PGL_TPU_FUSED_GATHER", "1")
    g_fused = jax.grad(loss)(x)
    monkeypatch.setenv("PGL_TPU_FUSED_GATHER", "0")
    g_base = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_base),
                               rtol=0, atol=0)


def test_chunked_spmm_matches_unchunked():
    """chunk_edges forces multi-chunk execution; outputs and gradients must
    be bit-identical to the single-call path (incl. hub blocks that grow
    the cap and the weighted variant)."""
    from pgl_tpu.ops.pallas.segment_kernels import (build_blocked_layout,
                                                    spmm, spmm_weighted)
    rng = np.random.default_rng(11)
    N, E, D = 900, 7000, 128
    dst = np.sort(rng.integers(0, N, E)).astype(np.int64)
    src = rng.integers(0, N, E).astype(np.int64)
    indptr = np.concatenate([[0], np.cumsum(np.bincount(dst, minlength=N))])
    order = np.argsort(src, kind="stable")
    indptr_s = np.concatenate([[0],
                               np.cumsum(np.bincount(src, minlength=N))])
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))

    base_csc = build_blocked_layout(indptr, src, N, 128, 256)
    base_csr = build_blocked_layout(indptr_s, dst[order], N, 128, 256)
    # tiny budget → many chunks (each covering few 128-row blocks)
    ch_csc = build_blocked_layout(indptr, src, N, 128, 256,
                                  chunk_edges=1024)
    ch_csr = build_blocked_layout(indptr_s, dst[order], N, 128, 256,
                                  chunk_edges=1024)
    assert ch_csc.chunks is not None and len(ch_csc.chunks) > 2

    ref = spmm(x, base_csc, base_csr, 128, 256, True)
    out = spmm(x, ch_csc, ch_csr, 128, 256, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    g1 = jax.grad(lambda x: (spmm(x, base_csc, base_csr, 128, 256, True)
                             ** 2).sum())(x)
    g2 = jax.grad(lambda x: (spmm(x, ch_csc, ch_csr, 128, 256, True)
                             ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-4, atol=1e-4)

    # weighted variant through the chunked path
    w = rng.normal(size=E).astype(np.float32)
    w_csc = jnp.zeros(ch_csc.padded_v.shape[0], jnp.float32).at[:E].set(
        jnp.asarray(w))
    w_csr = jnp.zeros(ch_csr.padded_v.shape[0], jnp.float32).at[:E].set(
        jnp.asarray(w[order]))
    w_csc_b = jnp.zeros(base_csc.padded_v.shape[0], jnp.float32
                        ).at[:E].set(jnp.asarray(w))
    w_csr_b = jnp.zeros(base_csr.padded_v.shape[0], jnp.float32
                        ).at[:E].set(jnp.asarray(w[order]))
    ref_w = spmm_weighted(x, w_csc_b, w_csr_b, base_csc, base_csr,
                          128, 256, True)
    out_w = spmm_weighted(x, w_csc, w_csr, ch_csc, ch_csr, 128, 256, True)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(ref_w),
                               rtol=1e-4, atol=1e-4)


def test_chunked_hub_splits_block():
    """A hub row block larger than the budget is processed in several
    accumulating cap-sized passes — the budget holds even for hubs."""
    from pgl_tpu.ops.pallas.segment_kernels import (build_blocked_layout,
                                                    spmm)
    rng = np.random.default_rng(12)
    N, E, D = 512, 4000, 128
    # node 0 absorbs most edges → its 128-row block exceeds the budget
    dst = np.sort(np.concatenate([
        np.zeros(E // 2, np.int64),
        rng.integers(0, N, E - E // 2)])).astype(np.int64)
    src = rng.integers(0, N, E).astype(np.int64)
    indptr = np.concatenate([[0], np.cumsum(np.bincount(dst, minlength=N))])
    order = np.argsort(src, kind="stable")
    indptr_s = np.concatenate([[0],
                               np.cumsum(np.bincount(src, minlength=N))])
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    ch_csc = build_blocked_layout(indptr, src, N, 128, 256,
                                  chunk_edges=512)
    ch_csr = build_blocked_layout(indptr_s, dst[order], N, 128, 256,
                                  chunk_edges=512)
    assert ch_csc.chunk_cap == 512          # budget holds
    assert any(len(sz) > 1 for _, _, sz in ch_csc.chunks)  # hub split
    base_csc = build_blocked_layout(indptr, src, N, 128, 256)
    base_csr = build_blocked_layout(indptr_s, dst[order], N, 128, 256)
    np.testing.assert_allclose(
        np.asarray(spmm(x, ch_csc, ch_csr, 128, 256, True)),
        np.asarray(spmm(x, base_csc, base_csr, 128, 256, True)),
        rtol=1e-5, atol=1e-5)


def _make_additive_case(N, E, H, DVH, seed=7):
    from pgl_tpu.ops.pallas.segment_kernels import build_blocked_layout
    rng = np.random.default_rng(seed)
    dst = np.sort(rng.integers(0, N, E)).astype(np.int64)
    src = rng.integers(0, N, E).astype(np.int64)
    indptr = np.concatenate([[0], np.cumsum(np.bincount(dst, minlength=N))])
    csc = build_blocked_layout(indptr, src, N, 128, 256)
    order = np.argsort(src, kind="stable")
    indptr_s = np.concatenate([[0],
                               np.cumsum(np.bincount(src, minlength=N))])
    csr = build_blocked_layout(indptr_s, dst[order], N, 128, 256)
    perm = jnp.asarray(order.astype(np.int32))
    a_dst = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    DV = max(128, -(-H * DVH // 128) * 128)
    v = jnp.zeros((N, DV)).at[:, :H * DVH].set(
        jnp.asarray(rng.normal(size=(N, H * DVH)).astype(np.float32)))
    return csc, csr, perm, a_dst, a_src, v, jnp.asarray(src), \
        jnp.asarray(dst), DV


@pytest.mark.parametrize("H,DVH", [(8, 8), (1, 16), (4, 32)])
def test_fused_gat_additive_matches_xla(H, DVH):
    """Additive-score fused kernel (VPU scores, a_src on the kv stream)."""
    from pgl_tpu.ops.pallas.attention_kernels import (
        fused_gat_attention, _xla_additive_reference)
    csc, csr, perm, a_dst, a_src, v, src, dst, DV = _make_additive_case(
        170, 2500, H, DVH)
    out = fused_gat_attention(a_dst, a_src, v, csc, (csr, perm), 0.2,
                              128, 256, True, DVH)
    ref = _xla_additive_reference(a_dst, a_src, v, src, dst, 170, 0.2,
                                  DVH, DV)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("leaky", [0.0, 0.2])
def test_fused_gat_additive_analytical_bwd(leaky):
    """Additive-mode flash backward (da_dst/da_src row sums, fused CSR
    stream with a_dst in the ld chunk) matches XLA autodiff."""
    from pgl_tpu.ops.pallas.attention_kernels import (
        fused_gat_attention, _xla_additive_reference)
    H, DVH = 8, 8
    csc, csr, perm, a_dst, a_src, v, src, dst, DV = _make_additive_case(
        150, 2200, H, DVH, seed=9)
    rng = np.random.default_rng(11)
    tgt = jnp.asarray(rng.normal(size=(150, DV)).astype(np.float32))

    def loss_fused(a_dst, a_src, v):
        return ((fused_gat_attention(a_dst, a_src, v, csc, (csr, perm),
                                     leaky, 128, 256, True, DVH)
                 - tgt) ** 2).sum()

    def loss_ref(a_dst, a_src, v):
        return ((_xla_additive_reference(a_dst, a_src, v, src, dst, 150,
                                         leaky, DVH, DV) - tgt) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(a_dst, a_src, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(a_dst, a_src, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_fused_gat_additive_dropout():
    """In-kernel attention-prob dropout: the deterministic hash mask is
    replicated in XLA from the CSC edge index — fwd and grads must match
    the masked unfused composition exactly (same mask, same scaling)."""
    from pgl_tpu.ops.pallas.attention_kernels import (
        fused_gat_attention, _drop_keep)
    from pgl_tpu.ops.segment import segment_softmax
    H, DVH, rate = 8, 8, 0.4
    csc, csr, perm, a_dst, a_src, v, src, dst, DV = _make_additive_case(
        140, 2000, H, DVH, seed=13)
    E = int(src.shape[0])
    seed = jnp.int32(12345)

    def ref(a_dst, a_src, v):
        s = jnp.take(a_dst, dst, axis=0) + jnp.take(a_src, src, axis=0)
        s = jnp.where(s >= 0, s, s * 0.2)
        p = segment_softmax(s, dst, num_segments=140)
        idx = jnp.arange(E, dtype=jnp.int32)[:, None]        # CSC position
        keep = jnp.stack([_drop_keep(idx[:, 0], seed, h, rate)
                          for h in range(H)], axis=1)        # [E, H]
        q = jnp.where(keep, p, 0.0) / (1.0 - rate)
        v_e = jnp.take(v[:, :H * DVH], src, axis=0).reshape(E, H, DVH)
        msg = (v_e * q[..., None]).reshape(E, H * DVH)
        out = jax.ops.segment_sum(msg, dst, num_segments=140)
        return jnp.concatenate(
            [out, jnp.zeros((140, DV - H * DVH), out.dtype)], axis=1)

    def fused(a_dst, a_src, v):
        return fused_gat_attention(a_dst, a_src, v, csc, (csr, perm), 0.2,
                                   128, 256, True, DVH, rate, seed)

    out_f = fused(a_dst, a_src, v)
    out_r = ref(a_dst, a_src, v)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-4, atol=1e-5)

    rng = np.random.default_rng(3)
    tgt = jnp.asarray(rng.normal(size=(140, DV)).astype(np.float32))
    g1 = jax.grad(lambda *a: ((fused(*a) - tgt) ** 2).sum(),
                  argnums=(0, 1, 2))(a_dst, a_src, v)
    g2 = jax.grad(lambda *a: ((ref(*a) - tgt) ** 2).sum(),
                  argnums=(0, 1, 2))(a_dst, a_src, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_fused_gat_additive_dropout_rate0_matches_plain():
    from pgl_tpu.ops.pallas.attention_kernels import fused_gat_attention
    csc, csr, perm, a_dst, a_src, v, src, dst, DV = _make_additive_case(
        120, 1500, 4, 16, seed=21)
    out0 = fused_gat_attention(a_dst, a_src, v, csc, (csr, perm), 0.2,
                               128, 256, True, 16)
    out1 = fused_gat_attention(a_dst, a_src, v, csc, (csr, perm), 0.2,
                               128, 256, True, 16, 0.0, jnp.int32(7))
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))


def test_fused_dot_attention_dropout():
    """Dot-score mode with in-kernel dropout (TransformerConv path)."""
    from pgl_tpu.ops.pallas.attention_kernels import (
        fused_graph_attention, _xla_reference)
    from pgl_tpu.ops.pallas.segment_kernels import build_blocked_layout
    rng = np.random.default_rng(6)
    N, E, H, D, rate = 130, 1800, 2, 64, 0.3
    dst = np.sort(rng.integers(0, N, E)).astype(np.int64)
    src = rng.integers(0, N, E).astype(np.int64)
    indptr = np.concatenate([[0], np.cumsum(np.bincount(dst, minlength=N))])
    csc = build_blocked_layout(indptr, src, N, 128, 256)
    order = np.argsort(src, kind="stable")
    indptr_s = np.concatenate([[0],
                               np.cumsum(np.bincount(src, minlength=N))])
    csr = build_blocked_layout(indptr_s, dst[order], N, 128, 256)
    perm = jnp.asarray(order.astype(np.int32))
    q = jnp.asarray(rng.normal(size=(N, H * D)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(N, H * D)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(N, H * D)).astype(np.float32))
    seed = jnp.int32(987)
    tgt = jnp.asarray(rng.normal(size=(N, H * D)).astype(np.float32))

    def fused(q, k, v):
        return fused_graph_attention(q, k, v, csc, (csr, perm), H, 0.0,
                                     128, 256, True, D, D, rate, seed)

    def ref(q, k, v):
        return _xla_reference(q, k, v, jnp.asarray(src), jnp.asarray(dst),
                              N, H, 0.0, D, D, rate, seed)

    np.testing.assert_allclose(np.asarray(fused(q, k, v)),
                               np.asarray(ref(q, k, v)),
                               rtol=1e-4, atol=1e-5)
    g1 = jax.grad(lambda *a: ((fused(*a) - tgt) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: ((ref(*a) - tgt) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_fused_gat_additive_rectangular_spaces():
    """dst rows and src table are different node spaces (the halo-shard
    shape: owned dst rows vs [local + remote] src table)."""
    from pgl_tpu.ops.pallas.attention_kernels import (
        fused_gat_attention, _xla_additive_reference)
    from pgl_tpu.ops.pallas.segment_kernels import build_blocked_layout
    rng = np.random.default_rng(17)
    N_dst, N_src, E, H, DVH = 100, 160, 1700, 4, 16
    dst = np.sort(rng.integers(0, N_dst, E)).astype(np.int64)
    src = rng.integers(0, N_src, E).astype(np.int64)
    indptr = np.concatenate([[0],
                             np.cumsum(np.bincount(dst, minlength=N_dst))])
    csc = build_blocked_layout(indptr, src, N_dst, 128, 256)
    order = np.argsort(src, kind="stable")
    indptr_s = np.concatenate(
        [[0], np.cumsum(np.bincount(src, minlength=N_src))])
    csr = build_blocked_layout(indptr_s, dst[order], N_src, 128, 256)
    perm = jnp.asarray(order.astype(np.int32))
    a_dst = jnp.asarray(rng.normal(size=(N_dst, H)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(N_src, H)).astype(np.float32))
    DV = 128
    v = jnp.zeros((N_src, DV)).at[:, :H * DVH].set(
        jnp.asarray(rng.normal(size=(N_src, H * DVH)).astype(np.float32)))
    tgt = jnp.asarray(rng.normal(size=(N_dst, DV)).astype(np.float32))

    def fused(a_dst, a_src, v):
        return fused_gat_attention(a_dst, a_src, v, csc, (csr, perm), 0.2,
                                   128, 256, True, DVH)

    def ref(a_dst, a_src, v):
        return _xla_additive_reference(a_dst, a_src, v, jnp.asarray(src),
                                       jnp.asarray(dst), N_dst, 0.2,
                                       DVH, DV)

    np.testing.assert_allclose(np.asarray(fused(a_dst, a_src, v)),
                               np.asarray(ref(a_dst, a_src, v)),
                               rtol=1e-4, atol=1e-5)
    g1 = jax.grad(lambda *a: ((fused(*a) - tgt) ** 2).sum(),
                  argnums=(0, 1, 2))(a_dst, a_src, v)
    g2 = jax.grad(lambda *a: ((ref(*a) - tgt) ** 2).sum(),
                  argnums=(0, 1, 2))(a_dst, a_src, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# two-phase unique-src dedup SpMM (dedup_kernels.py)
# ---------------------------------------------------------------------------

def _dedup_case(N, E, seed=0, hub=False):
    rng = np.random.default_rng(seed)
    if hub:
        # half the edges come from 8 hub srcs (high dedup), some empty dsts
        src = np.concatenate([rng.integers(0, 8, E // 2),
                              rng.integers(0, N, E - E // 2)])
        dst = rng.integers(0, N // 2, E)
    else:
        src = rng.integers(0, N, E)
        dst = rng.integers(0, N, E)
    edges = np.stack([src, dst], axis=1)
    order = np.argsort(edges[:, 1], kind="stable")
    deg = np.bincount(edges[:, 1], minlength=N)
    indptr = np.concatenate([[0], np.cumsum(deg)])
    return edges, indptr, edges[order, 0]


@pytest.mark.parametrize("N,E,hub", [
    (700, 5000, False),
    (600, 4000, True),          # hub srcs + empty dst blocks
    (90, 333, False),           # fewer nodes than one block, tiny E
    (1500, 20000, False),
])
def test_dedup_spmm_matches_xla(N, E, hub):
    from pgl_tpu.ops.pallas.dedup_kernels import (build_dedup_layout,
                                                  spmm_dedup)
    D = 128
    edges, indptr, src_csc = _dedup_case(N, E, seed=N + E, hub=hub)
    # CSR for the transposed backward
    deg_r = np.bincount(edges[:, 0], minlength=N)
    indptr_r = np.concatenate([[0], np.cumsum(deg_r)])
    dst_csr = edges[np.argsort(edges[:, 0], kind="stable"), 1]
    csc_d = build_dedup_layout(indptr, src_csc, N)
    csr_d = build_dedup_layout(indptr_r, dst_csr, N)
    feat = np.random.default_rng(1).normal(size=(N, D)).astype(np.float32)

    out = spmm_dedup(jnp.asarray(feat), csc_d, csr_d, interpret=True)
    ref = jax.ops.segment_sum(jnp.asarray(feat)[edges[:, 0]],
                              jnp.asarray(edges[:, 1]), num_segments=N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    tgt = np.asarray(ref) * 0.5
    g_pl = jax.grad(lambda x: ((spmm_dedup(x, csc_d, csr_d, interpret=True)
                                - tgt) ** 2).sum())(jnp.asarray(feat))
    g_ref = jax.grad(lambda x: ((jax.ops.segment_sum(
        x[edges[:, 0]], jnp.asarray(edges[:, 1]), num_segments=N)
        - tgt) ** 2).sum())(jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_dedup_spmm_nondefault_window_width():
    """Layouts built with a non-default rank-window width (w=256, the
    PGL_TPU_DEDUP_W override) stay correct end-to-end — guards the
    layout.w propagation in graph.py's spmm_dedup call (the kernel's
    static ``w`` must always come from the layout, never W_DEFAULT)."""
    from pgl_tpu.ops.pallas.dedup_kernels import (build_dedup_layout,
                                                  spmm_dedup, NBD_DEFAULT,
                                                  ETD_DEFAULT)
    N, E, D, W = 600, 4000, 128, 256
    edges, indptr, src_csc = _dedup_case(N, E, seed=N + E, hub=True)
    deg_r = np.bincount(edges[:, 0], minlength=N)
    indptr_r = np.concatenate([[0], np.cumsum(deg_r)])
    dst_csr = edges[np.argsort(edges[:, 0], kind="stable"), 1]
    csc_d = build_dedup_layout(indptr, src_csc, N, w=W)
    csr_d = build_dedup_layout(indptr_r, dst_csr, N, w=W)
    assert csc_d.w == W
    feat = np.random.default_rng(1).normal(size=(N, D)).astype(np.float32)
    out = spmm_dedup(jnp.asarray(feat), csc_d, csr_d,
                     NBD_DEFAULT, ETD_DEFAULT, csc_d.w, True)
    ref = jax.ops.segment_sum(jnp.asarray(feat)[edges[:, 0]],
                              jnp.asarray(edges[:, 1]), num_segments=N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_dedup_attention_nondefault_window_width():
    """dedup_gat_attention over a w=256 layout matches the XLA
    edge-softmax reference (fwd; layout.w is the kernels' only width
    source)."""
    from pgl_tpu.ops.pallas.dedup_kernels import build_dedup_layout
    from pgl_tpu.ops.pallas.dedup_attention import (dedup_gat_attention,
                                                    build_uniq_reduce)
    N, E, H, DVH, W = 600, 4000, 4, 16, 256
    edges, indptr, src_csc = _dedup_case(N, E, seed=11, hub=True)
    csc_d = build_dedup_layout(indptr, src_csc, N, w=W)
    red = build_uniq_reduce(csc_d, N)
    rng = np.random.default_rng(2)
    a_dst = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(N, H * DVH)).astype(np.float32))
    out = dedup_gat_attention(a_dst, a_src, v, csc_d, red, num_heads=H,
                              dvh=DVH, interpret=True)
    src, dst = edges[:, 0], edges[:, 1]
    s = np.asarray(a_dst)[dst] + np.asarray(a_src)[src]
    s = np.where(s > 0, s, 0.2 * s)
    mx = np.full((N, H), -1e30)
    np.maximum.at(mx, dst, s)
    e = np.exp(s - mx[dst])
    den = np.zeros((N, H))
    np.add.at(den, dst, e)
    p = e / np.maximum(den[dst], 1e-30)
    ref = np.zeros((N, H, DVH), np.float32)
    np.add.at(ref, dst, p[:, :, None] * np.asarray(v).reshape(N, H, DVH)[src])
    np.testing.assert_allclose(np.asarray(out).reshape(N, H, DVH), ref,
                               rtol=2e-3, atol=2e-3)


def test_dedup_weighted_matches_xla():
    from pgl_tpu.ops.pallas.dedup_kernels import (build_dedup_layout,
                                                  spmm_dedup_weighted)
    N, E, D = 500, 6000, 128
    edges, indptr, src_csc = _dedup_case(N, E, seed=7, hub=True)
    deg_r = np.bincount(edges[:, 0], minlength=N)
    indptr_r = np.concatenate([[0], np.cumsum(deg_r)])
    dst_csr = edges[np.argsort(edges[:, 0], kind="stable"), 1]
    csc_d = build_dedup_layout(indptr, src_csc, N)
    csr_d = build_dedup_layout(indptr_r, dst_csr, N)

    rng = np.random.default_rng(2)
    feat = rng.normal(size=(N, D)).astype(np.float32)
    wts = rng.normal(size=E).astype(np.float32)
    w_csc_sorted = wts[np.argsort(edges[:, 1], kind="stable")]
    w_csr_sorted = wts[np.argsort(edges[:, 0], kind="stable")]
    w_csc = np.zeros(csc_d.padded_v.shape[0], np.float32)
    w_csc[:E] = w_csc_sorted[np.asarray(csc_d.eid)]
    w_csr = np.zeros(csr_d.padded_v.shape[0], np.float32)
    w_csr[:E] = w_csr_sorted[np.asarray(csr_d.eid)]

    def pallas_fn(x, w1):
        return spmm_dedup_weighted(x, w1, jnp.asarray(w_csr), csc_d, csr_d,
                                   interpret=True)

    def ref_fn(x, w_full):
        return jax.ops.segment_sum(w_full[:, None] * x[edges[:, 0]],
                                   jnp.asarray(edges[:, 1]), num_segments=N)

    out = pallas_fn(jnp.asarray(feat), jnp.asarray(w_csc))
    ref = ref_fn(jnp.asarray(feat), jnp.asarray(wts))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # dx and dw parity (dw comes back in dedup-CSC order)
    tgt = np.asarray(ref) * 0.3
    gx_p, gw_p = jax.grad(
        lambda x, w1: ((pallas_fn(x, w1) - tgt) ** 2).sum(),
        argnums=(0, 1))(jnp.asarray(feat), jnp.asarray(w_csc))
    gx_r, gw_r = jax.grad(
        lambda x, w_full: ((ref_fn(x, w_full) - tgt) ** 2).sum(),
        argnums=(0, 1))(jnp.asarray(feat), jnp.asarray(wts))
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-4)
    # map reference dw (original edge order) into dedup-CSC order
    gw_r_d = np.asarray(gw_r)[np.argsort(edges[:, 1], kind="stable")][
        np.asarray(csc_d.eid)]
    np.testing.assert_allclose(np.asarray(gw_p)[:E], gw_r_d,
                               rtol=1e-3, atol=1e-4)


def test_dedup_layout_covers_every_edge():
    from pgl_tpu.ops.pallas.dedup_kernels import build_dedup_layout
    N, E = 400, 3000
    edges, indptr, src_csc = _dedup_case(N, E, seed=4)
    lay = build_dedup_layout(indptr, src_csc, N)
    # eid is a permutation of CSC positions
    assert sorted(np.asarray(lay.eid).tolist()) == list(range(E))
    # every edge's (dst, src) pair survives the reorder
    dst_csc = np.sort(edges[:, 1], kind="stable")
    got = set(zip(np.asarray(lay.padded_ids).reshape(-1)[:E].tolist(),
                  np.asarray(lay.padded_v)[:E].tolist()))
    want = set(zip(dst_csc.tolist(), src_csc.tolist()))
    assert got == want
    # pair_blk ascending (revisiting requirement)
    pb = np.asarray(lay.pair_blk)
    assert (np.diff(pb) >= 0).all()


def test_streamed_spmm_host_features():
    """StreamedSpMM (UVA analog): host-resident feature table, chunked
    unique-row staging, host output — matches the XLA reference across
    multiple chunks, including a chunk-straddling hub."""
    from pgl_tpu.ops.pallas.streaming import StreamedSpMM
    N, E, D = 2200, 15000, 128
    rng = np.random.default_rng(3)
    src = np.concatenate([rng.integers(0, 16, E // 3),      # hub srcs
                          rng.integers(0, N, E - E // 3)])
    dst = rng.integers(0, N, E)
    order = np.argsort(dst, kind="stable")
    deg = np.bincount(dst, minlength=N)
    indptr = np.concatenate([[0], np.cumsum(deg)])
    feat = rng.normal(size=(N, D)).astype(np.float32)

    # chunk_rows=512 -> 5 chunks of 2 blocks each
    sp = StreamedSpMM(indptr, src[order], N, chunk_rows=512,
                      interpret=True)
    assert len(sp.chunks) == 5
    out = sp(feat)
    ref = np.asarray(jax.ops.segment_sum(
        jnp.asarray(feat)[src], jnp.asarray(dst), num_segments=N))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    # memmap-backed features work identically (the >HBM posture)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "feat.npy")
        np.save(p, feat)
        mm = np.load(p, mmap_mode="r")
        out2 = sp(mm)
        np.testing.assert_allclose(out2, ref, rtol=1e-4, atol=1e-4)


# ----------------------------------------------------------------------
# vector edge features through the fused weighted kernel
# (reference pgl/graph.py:930 — fused send_ue_recv for ANY tensor feat)
# ----------------------------------------------------------------------

def _vec_case(H, op, seed=21):
    import jax
    from pgl_tpu.ops.pallas.segment_kernels import (build_blocked_layout,
                                                    spmm_weighted)
    rng = np.random.default_rng(seed)
    N, E, D = 500, 4000, 128
    dst = np.sort(rng.integers(0, N, E)).astype(np.int64)
    src = rng.integers(0, N, E).astype(np.int64)
    indptr = np.concatenate([[0], np.cumsum(np.bincount(dst, minlength=N))])
    order = np.argsort(src, kind="stable")
    indptr_s = np.concatenate([[0],
                               np.cumsum(np.bincount(src, minlength=N))])
    csc = build_blocked_layout(indptr, src, N, 128, 256)
    csr = build_blocked_layout(indptr_s, dst[order], N, 128, 256)
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    w = rng.normal(size=(E, H)).astype(np.float32)
    w_csc = jnp.zeros((csc.padded_v.shape[0], H), jnp.float32
                      ).at[:E].set(jnp.asarray(w))
    w_csr = jnp.zeros((csr.padded_v.shape[0], H), jnp.float32
                      ).at[:E].set(jnp.asarray(w[order]))

    def fused(x, wc):
        return spmm_weighted(x, wc, w_csr, csc, csr, 128, 256, True, op)

    def ref(x, w_full):
        msgs = x[src].reshape(E, H, -1)
        we = w_full[:, :, None]
        msgs = msgs + we if op == "add" else msgs * we
        return jax.ops.segment_sum(msgs.reshape(E, -1), jnp.asarray(dst),
                                   num_segments=N)

    return x, w, w_csc, fused, ref


@pytest.mark.parametrize("H,op", [(128, "mul"), (128, "add"),
                                  (8, "mul"), (8, "add")])
def test_vector_edge_feat_fused(H, op):
    import jax
    x, w, w_csc, fused, ref = _vec_case(H, op)
    np.testing.assert_allclose(np.asarray(fused(x, w_csc)),
                               np.asarray(ref(x, jnp.asarray(w))),
                               rtol=1e-4, atol=1e-4)
    tgt = np.asarray(ref(x, jnp.asarray(w))) * 0.9
    gx_f, gw_f = jax.grad(
        lambda x, wc: ((fused(x, wc) - tgt) ** 2).sum(),
        argnums=(0, 1))(x, w_csc)
    gx_r, gw_r = jax.grad(
        lambda x, wf: ((ref(x, wf) - tgt) ** 2).sum(),
        argnums=(0, 1))(x, jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-3)
    E = w.shape[0]
    np.testing.assert_allclose(np.asarray(gw_f)[:E], np.asarray(gw_r),
                               rtol=1e-3, atol=1e-3)


def test_send_ue_recv_vector_dispatch():
    """Graph.send_ue_recv routes [E, D] edge features through the fused
    kernel on pallas-eligible graphs and matches the XLA fallback."""
    import jax
    from pgl_tpu import Graph
    from pgl_tpu.ops import dispatch as disp
    rng = np.random.default_rng(4)
    N, E, D = 300, 2500, 128
    edges = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)], 1)
    g = Graph(edges, num_nodes=N,
              node_feat={"h": rng.normal(size=(N, D)).astype(np.float32)})
    gt = g.tensor()
    ew = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
    x = gt.node_feat["h"]
    ref = jax.ops.segment_sum(x[jnp.asarray(edges[:, 0])] * ew,
                              jnp.asarray(edges[:, 1]), num_segments=N)
    if gt._spmm_layouts is not None:
        orig = disp.use_pallas_spmm
        disp.use_pallas_spmm = lambda *a, **k: True
        try:
            import pgl_tpu.ops.pallas.segment_kernels as sk
            orig_call = sk.spmm_weighted
            called = {}

            def spy(*a, **k):
                called["yes"] = True
                a = list(a)
                a[7] = True   # force interpret on CPU
                return orig_call(*a, **k)

            sk.spmm_weighted = spy
            try:
                out = gt.send_ue_recv(x, ew, "mul", "sum")
            finally:
                sk.spmm_weighted = orig_call
        finally:
            disp.use_pallas_spmm = orig
        assert called.get("yes"), "vector path did not hit fused kernel"
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
