"""Benchmark harness — prints ONE JSON line.

Headline metric: processed edges/s for a 3-layer GCN *training step*
(forward + backward + adam update) on a power-law graph, on the default
backend (the real TPU chip under the driver).

``vs_baseline``: ratio of the reference's published V100 GCN-Cora epoch time
(0.0047 s, BASELINE.md 'Speed' table) to our measured epoch time on a
Cora-shaped graph (2708 nodes / ~10.5k edges / 1433→16→7). >1.0 means faster
than the reference.
"""

import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _build_train_step(model, opt):
    import jax
    import optax

    @jax.jit
    def train_step(params, opt_state, g, x, y):
        def loss_fn(p):
            logits = model.apply(p, g, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    return train_step


def _time_steps(train_step, params, opt_state, g, x, y, warmup=3, iters=20,
                repeats=1):
    """Chain optimizer state through iterations: each step's inputs depend on
    the previous step's outputs, so no runtime/transport layer can serve a
    cached result and the timing covers real sequential execution.
    ``repeats`` > 1 takes the fastest repetition — the robust estimator when
    per-call transport jitter is comparable to the step time (the Cora-sized
    steps over the tunnel)."""
    import jax

    for _ in range(warmup):
        params, opt_state, loss = train_step(params, opt_state, g, x, y)
    float(loss)  # host readback = true synchronization barrier
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, loss = train_step(params, opt_state, g, x, y)
        # block_until_ready can return early on tunneled/remote backends; a
        # scalar host readback cannot — it forces the whole dependent chain.
        float(loss)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    # Persistent compile cache: the tunnel's remote Mosaic compiles are slow
    # (minutes); cache executables so repeat runs start in seconds.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax
    from pgl_tpu.datasets import powerlaw_graph, cora_shaped_graph
    from pgl_tpu.models import GCN

    # --- headline: 3-layer GCN on power-law graph -------------------------
    num_nodes, avg_degree, feat_dim, hidden = 131072, 16, 128, 128
    g = powerlaw_graph(num_nodes=num_nodes, avg_degree=avg_degree,
                       feat_dim=feat_dim, seed=0).tensor()
    E = g.num_edges
    y = jnp.asarray(
        np.random.default_rng(0).integers(0, 16, num_nodes).astype(np.int32))
    model = GCN(input_size=feat_dim, num_class=16, num_layers=3,
                hidden_size=hidden, dropout=0.0)
    params = model.init(jax.random.key(0), g, g.node_feat["h"])
    opt = optax.adam(1e-3)
    step = _build_train_step(model, opt)
    t_step = _time_steps(step, params, opt.init(params), g,
                         g.node_feat["h"], y)
    # 3 SpMM in forward + 3 transposed SpMM in backward per step.
    edges_per_s = 6 * E / t_step

    # --- vs_baseline: Cora-shaped epoch time ------------------------------
    gc, labels, train_index = cora_shaped_graph(seed=0)
    gc = gc.tensor()
    yc = jnp.asarray(labels)
    model_c = GCN(input_size=1433, num_class=7, num_layers=2,
                  hidden_size=16, dropout=0.0)
    params_c = model_c.init(jax.random.key(0), gc, gc.node_feat["h"])
    step_c = _build_train_step(model_c, optax.adam(1e-2))
    t_cora = _time_steps(step_c, params_c, optax.adam(1e-2).init(params_c),
                         gc, gc.node_feat["h"], yc, iters=50, repeats=3)
    vs_baseline = 0.0047 / t_cora

    # --- fused graph-attention forward (GATConv, 8 heads) -----------------
    import pgl_tpu.nn as gnn
    ga = powerlaw_graph(num_nodes=65536, avg_degree=16, feat_dim=128,
                        seed=1).tensor()
    gat = gnn.GATConv(128, 16, num_heads=8, feat_drop=0.0, attn_drop=0.0)
    gat_params = gat.init(jax.random.key(0), ga, ga.node_feat["h"])

    @jax.jit
    def gat_loop(x):
        return jax.lax.fori_loop(
            0, 5, lambda i, v: v * 0.5 +
            gat.apply(gat_params, ga, v) * 1e-3, x)

    o = gat_loop(ga.node_feat["h"]); float(o[0, 0])
    t0 = time.perf_counter()
    o = gat_loop(ga.node_feat["h"]); float(o[0, 0])
    t_gat = (time.perf_counter() - t0) / 5

    print(json.dumps({
        "metric": "gcn3_train_edges_per_s",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs_baseline, 3),
        "detail": {
            "graph": f"powerlaw n={num_nodes} e={E} d={feat_dim} h={hidden}",
            "step_time_s": round(t_step, 5),
            "cora_epoch_s": round(t_cora, 5),
            "gat8_fwd_ms_1M_edges": round(t_gat * 1000, 2),
            "baseline": "V100 GCN-Cora epoch 0.0047s "
                        "(legacy/docs/source/md/introduction.md:46)",
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
