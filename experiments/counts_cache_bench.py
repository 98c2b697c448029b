"""Counts-cache A/B on the real chip: dedup SpMM fwd and GAT8 train step
with and without the materialized count matrix."""
import time, sys, os
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import optax

from pgl_tpu.datasets import powerlaw_graph
from pgl_tpu.models import GCN, GAT

R = 64

def timed(fn, *a):
    o = fn(*a); jax.tree_util.tree_map(lambda x: x.block_until_ready(), o)
    o = fn(*a)
    t0 = time.perf_counter()
    o = fn(*a)
    leaf = jax.tree_util.tree_leaves(o)[0]
    float(leaf.reshape(-1)[0])
    return (time.perf_counter() - t0)

def spmm_loop_t(g, x0):
    @jax.jit
    def spmm_loop(g, x):
        def body(i, x):
            y = g.send_recv(x, "sum")
            return y * (1.0 / (1.0 + jnp.max(jnp.abs(y)) * 1e-6))
        return jax.lax.fori_loop(0, R, body, x)
    f = lambda: spmm_loop(g, x0)
    o = f(); float(o[0, 0])
    t0 = time.perf_counter(); o = f(); float(o[0, 0])
    return (time.perf_counter() - t0) / R

mode = sys.argv[1] if len(sys.argv) > 1 else "both"
if mode in ("cached", "uncached"):
    if mode == "uncached":
        os.environ["PGL_TPU_COUNTS_BUDGET_MB"] = "0"
    g = powerlaw_graph(num_nodes=131072, avg_degree=16, feat_dim=128,
                       seed=0).tensor()
    lay = g._spmm_layouts[3]
    print("counts:", None if lay.counts is None else lay.counts.shape,
          "max_count:", lay.max_count)
    t = spmm_loop_t(g, g.node_feat["h"])
    print(f"spmm fwd {mode}: {t*1e3:.3f} ms")

    # GAT8 train step on 65k graph
    ga = powerlaw_graph(num_nodes=65536, avg_degree=16, feat_dim=128,
                        seed=1).tensor()
    y_gat = jnp.asarray(np.random.default_rng(1)
                        .integers(0, 16, 65536).astype(np.int32))
    model = GAT(input_size=128, num_class=16, num_heads=8, hidden_size=8,
                feat_drop=0.0, attn_drop=0.0)
    params = model.init(jax.random.key(0), ga, ga.node_feat["h"])
    opt = optax.adam(1e-3)

    @jax.jit
    def step(params, opt_state, g, x, y):
        def loss_fn(p):
            logits = model.apply(p, g, x)
            from pgl_tpu.ops import softmax_cross_entropy_integer
            return softmax_cross_entropy_integer(logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    ost = opt.init(params)
    for _ in range(3):
        params, ost, loss = step(params, ost, ga, ga.node_feat["h"], y_gat)
    float(loss)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            params, ost, loss = step(params, ost, ga, ga.node_feat["h"],
                                     y_gat)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"gat8 step {mode}: {best*1e3:.2f} ms")
