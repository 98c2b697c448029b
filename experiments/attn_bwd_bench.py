"""A/B the fused attention backward vs the XLA recompute backward on chip.

Run ONE mode per process (single-tenant chip):
    timeout -s INT 550 python experiments/attn_bwd_bench.py fused
    timeout -s INT 550 python experiments/attn_bwd_bench.py xla
Timing chains optimizer state through iterations (tunnel rule: iterations
must data-depend).
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1] if len(sys.argv) > 1 else "fused"
if mode == "xla":
    os.environ["PGL_TPU_ATTN_XLA_BWD"] = "1"

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import optax
from pgl_tpu.datasets import powerlaw_graph
from pgl_tpu.models import GAT

g = powerlaw_graph(num_nodes=65536, avg_degree=16, feat_dim=128,
                   seed=1).tensor()
E = g.num_edges
y = jnp.asarray(np.random.default_rng(0).integers(0, 16, 65536)
                .astype(np.int32))
model = GAT(input_size=128, num_class=16, num_heads=8, hidden_size=8,
            feat_drop=0.0, attn_drop=0.0)
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
print(f"[{mode}] compile+first step: {time.perf_counter()-t0:.1f}s "
      f"loss={float(loss):.4f}")
for _ in range(2):
    params, ost, loss = train_step(params, ost, g, g.node_feat["h"], y)
float(loss)
iters = 10
t0 = time.perf_counter()
for _ in range(iters):
    params, ost, loss = train_step(params, ost, g, g.node_feat["h"], y)
float(loss)
dt = (time.perf_counter() - t0) / iters
print(json.dumps({"mode": mode, "E": int(E),
                  "gat_step_ms": round(dt * 1000, 1),
                  "edges_per_s": round(2 * E / dt, 0),
                  "loss": float(loss)}))
