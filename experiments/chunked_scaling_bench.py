"""Per-edge cost scaling of the 3-layer GCN train step: 2M → 8M → 16M
edges with the chunked SpMM (VERDICT item 3 done-criteria: per-edge cost
within 1.2x across the range; the 16M step is the capacity proof).

    timeout -s INT 1800 python experiments/chunked_scaling_bench.py
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import optax
from pgl_tpu.datasets import powerlaw_graph
from pgl_tpu.models import GCN

import pgl_tpu
from pgl_tpu import Graph

def uniform_graph(num_nodes, avg_degree, seed=0):
    rng = np.random.default_rng(seed)
    E = num_nodes * avg_degree
    edges = rng.integers(0, num_nodes, (E, 2))
    feat = rng.normal(size=(num_nodes, 128)).astype(np.float32)
    return Graph(edges, num_nodes=num_nodes, node_feat={"h": feat})

kind = sys.argv[1] if len(sys.argv) > 1 else "powerlaw"
make = powerlaw_graph if kind == "powerlaw" else uniform_graph

results = []
for num_nodes, avg_degree in ((131072, 16), (524288, 16), (1048576, 16)):
    if kind == "powerlaw":
        g = make(num_nodes=num_nodes, avg_degree=avg_degree,
                 feat_dim=128, seed=0).tensor()
    else:
        g = make(num_nodes, avg_degree, seed=0).tensor()
    E = g.num_edges
    csc = g._spmm_layouts[0]
    y = jnp.asarray(np.random.default_rng(0)
                    .integers(0, 16, num_nodes).astype(np.int32))
    model = GCN(input_size=128, num_class=16, num_layers=3,
                hidden_size=128, dropout=0.0)
    params = model.init(jax.random.key(0), g, g.node_feat["h"])
    opt = optax.adam(1e-3)

    @jax.jit
    def train_step(params, opt_state, g, x, y):
        def loss_fn(p):
            logits = model.apply(p, g, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    ost = opt.init(params)
    t0 = time.perf_counter()
    params, ost, loss = train_step(params, ost, g, g.node_feat["h"], y)
    print(f"E={E} chunks={csc.chunks if csc.chunks else 1} "
          f"compile+first: {time.perf_counter()-t0:.1f}s "
          f"loss={float(loss):.3f}", flush=True)
    for _ in range(2):
        params, ost, loss = train_step(params, ost, g, g.node_feat["h"], y)
    float(loss)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        params, ost, loss = train_step(params, ost, g, g.node_feat["h"], y)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    per_edge_ns = dt / (6 * E) * 1e9
    results.append({"E": int(E), "step_ms": round(dt * 1000, 1),
                    "per_edge_traversal_ns": round(per_edge_ns, 2),
                    "chunks": len(csc.chunks) if csc.chunks else 1})
    print(json.dumps(results[-1]), flush=True)
    del g, params, ost, model

ratio = results[-1]["per_edge_traversal_ns"] / results[0][
    "per_edge_traversal_ns"]
print(json.dumps({"scaling_2M_to_16M": round(ratio, 3),
                  "results": results}))
