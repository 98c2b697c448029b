"""Break down the bench GAT train step (141 ms @ 1M edges, v5e, round 2).

Times, with data-dependent chained iterations (memory/tpu-tunnel-gotchas):
  - full train step (reference point)
  - model fwd only
  - layer-0 fused attention alone: H=8, dsh (score width), dv_pad=128
  - layer-1 fused attention alone: H=1
  - grad of each attention call alone
to locate where the step time goes before optimizing.

FINDINGS (v5e, n=65536, E=1M, measured 2026-08-17):
  1. Initial state: step 127 ms ≈ layer0 fwd+bwd 76 + layer1 fwd+bwd 40.
     The SEVEN per-layer row gathers (fwd k,v; bwd-CSC k,v; bwd-CSR
     q,g,ld) at ~10 ns/row explain ~70 ms — the step was gather-bound.
  2. Fusing to TWO gathers/layer (k|v in fwd, reused as a residual by the
     CSC pass; q|g|lse|delta one stream in the CSR pass): layer1 fwd
     19.8 → 11.4 ms.
  3. On-chip numerics audit found dq/dk rel err 0.2 (pre-existing): the
     MXU's default f32→bf16 lowering differs between the fwd and bwd
     score dots, so p = exp(s − lse) disagrees with the forward softmax
     and ds = p·(gv − delta) loses its cancellation. HIGHEST-precision
     score dots fix it (err → 5e-3) but cost ~1.4x with H=8.
  4. Additive-score mode (fused_gat_attention): GAT's a_dst + a_src
     scores as an exact f32 VPU outer sum (a_src rides the kv stream,
     transposed in-kernel) — no score matmuls at all. Step 127 → 65.9 ms,
     bench gat8 step 141.5 → 79.4 ms, exact scores by construction.
  Dot-score mode (TransformerConv) keeps HIGHEST: H=8/D=16 fwd+bwd
  110.8 ms, H=4/D=32 65.3 ms at 1M edges.

NOTE: the isolated layer0/layer1 sections below still drive the DOT-mode
kernel (fused_graph_attention); GATConv itself now uses the additive path.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import optax


def chain(fn, x0, R=8, label=""):
    @jax.jit
    def loop(x):
        def body(i, x):
            y = fn(x)
            if y.shape == x.shape:
                return y * (1.0 / (1.0 + jnp.max(jnp.abs(y)) * 1e-6))
            # shape-changing fn: perturb the input with the output's stat
            return x * (1.0 + jnp.max(jnp.abs(y)) * 1e-9)
        return jax.lax.fori_loop(0, R, body, x)

    o = loop(x0); float(o.ravel()[0])
    t0 = time.perf_counter()
    o = loop(x0); float(o.ravel()[0])
    dt = (time.perf_counter() - t0) / R
    print(f"  {label}: {dt*1000:.2f} ms")
    return dt


def main():
    from pgl_tpu.utils.platform import select_platform
    select_platform()
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from pgl_tpu.datasets import powerlaw_graph
    from pgl_tpu.models import GAT

    n = 65536
    ga = powerlaw_graph(num_nodes=n, avg_degree=16, feat_dim=128,
                        seed=1).tensor()
    E = ga.num_edges
    print(f"graph: n={n} E={E}")
    x = ga.node_feat["h"]
    y = jnp.asarray(np.random.default_rng(1)
                    .integers(0, 16, n).astype(np.int32))
    model = GAT(input_size=128, num_class=16, num_heads=8, hidden_size=8,
                feat_drop=0.0, attn_drop=0.0)
    params = model.init(jax.random.key(0), ga, x)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    # --- full step ------------------------------------------------------
    def loss_fn(p, xx):
        logits = model.apply(p, ga, xx, training=True)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    @jax.jit
    def step_chain(p, o_s, xx):
        def body(i, carry):
            p, o_s = carry
            loss, g = jax.value_and_grad(loss_fn)(p, xx)
            upd, o_s = opt.update(g, o_s, p)
            return (optax.apply_updates(p, upd), o_s)
        p, o_s = jax.lax.fori_loop(0, 8, body, (p, o_s))
        return p, o_s

    p2, _ = step_chain(params, opt_state, x)
    float(jax.tree_util.tree_leaves(p2)[0].ravel()[0])
    t0 = time.perf_counter()
    p2, _ = step_chain(params, opt_state, x)
    float(jax.tree_util.tree_leaves(p2)[0].ravel()[0])
    print(f"  full train step: {(time.perf_counter()-t0)/8*1000:.2f} ms")

    # --- fwd only -------------------------------------------------------
    chain(lambda xx: model.apply(params, ga, xx, training=True), x,
          label="model fwd only")

    # --- grad wrt x (fwd+bwd through both layers, no opt) ---------------
    chain(lambda xx: jax.grad(lambda q: loss_fn(params, q))(xx), x,
          label="fwd+bwd wrt x only")

    # --- isolated fused attention calls ---------------------------------
    from pgl_tpu.ops.pallas.attention_kernels import (
        fused_graph_attention, gat_score_features)
    csc, csr, perm = ga._spmm_layouts[:3]   # tuple grew (dedup layouts)
    rng = np.random.default_rng(0)

    for (H, Dh, label) in ((8, 8, "layer0 H=8 Dh=8"),
                           (1, 16, "layer1 H=1 Dh=16")):
        feat = jnp.asarray(rng.normal(size=(n, H, Dh)).astype(np.float32))
        a_src = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
        a_dst = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
        q, k = gat_score_features(a_dst, a_src)
        dsh = q.shape[1] // H
        dv_pad = max(128, -(-H * Dh // 128) * 128)
        v = feat.reshape(-1, H * Dh)
        if dv_pad > H * Dh:
            v = jnp.concatenate(
                [v, jnp.zeros((v.shape[0], dv_pad - H * Dh), v.dtype)],
                axis=1)
        print(f"  [{label}] q/k width {q.shape[1]} v width {v.shape[1]}")

        def att(vv, q=q, k=k, H=H, Dh=Dh, dsh=dsh):
            return fused_graph_attention(q, k, vv, csc, (csr, perm), H,
                                         0.2, dsh=dsh, dvh=Dh)

        chain(att, v, label=f"{label} fwd")

        def att_grad(vv, q=q, k=k, H=H, Dh=Dh, dsh=dsh):
            def f(qq, kk, vx):
                return fused_graph_attention(
                    qq, kk, vx, csc, (csr, perm), H, 0.2,
                    dsh=dsh, dvh=Dh).sum()
            dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, vv)
            return dv + dq.sum() + dk.sum()

        chain(att_grad, v, label=f"{label} fwd+bwd")


if __name__ == "__main__":
    main()
