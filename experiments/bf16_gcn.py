"""bf16 mixed-precision GCN training speed prototype: cast params +
features to bf16 (loss/grads flow back in bf16, adam in f32 master via
optax) and compare the 3-layer 2M-edge train step against f32.

Run on TPU: python experiments/bf16_gcn.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from pgl_tpu.datasets.synthetic import powerlaw_graph
from pgl_tpu.models import GCN


def time_steps(step, params, opt_state, g, x, y, iters=50):
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, g, x, y)
    float(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        p, o, l = params, opt_state, None
        for _ in range(iters):
            p, o, l = step(p, o, g, x, y)
        float(l)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    g = powerlaw_graph(num_nodes=131072, avg_degree=16, feat_dim=128,
                       seed=0).tensor()
    E = g.num_edges
    y = jnp.asarray(np.random.default_rng(0)
                    .integers(0, 16, g.num_nodes).astype(np.int32))
    model = GCN(input_size=128, num_class=16, num_layers=3,
                hidden_size=128, dropout=0.0)
    x32 = g.node_feat["h"]
    params = model.init(jax.random.key(0), g, x32)
    opt = optax.adam(1e-3)

    def build_step(dtype):
        def step(params, opt_state, g, x, y):
            def loss_fn(p):
                pc = jax.tree.map(lambda a: a.astype(dtype), p)
                logits = model.apply(pc, g, x.astype(dtype))
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32), y).mean()
            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt_state = opt.update(
                jax.tree.map(lambda a: a.astype(jnp.float32), grads),
                opt_state)
            return optax.apply_updates(params, upd), opt_state, loss
        return jax.jit(step)

    for name, dtype in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        t = time_steps(build_step(dtype), params, opt.init(params),
                       g, x32, y)
        print(f"{name}: {t * 1000:.2f} ms/step  "
              f"{6 * E / t / 1e6:.1f}M edges/s", flush=True)


if __name__ == "__main__":
    main()

# Measured (TPU v5e, 2026-08-20): f32 19.55 ms (643M edges/s) vs bf16
# 18.11 ms (695M edges/s) — only +8%. The train step is bound by the
# SpMM's row-count-bound gathers (dtype-insensitive) and the dedup count
# matmuls are already bf16, so end-to-end mixed precision buys little on
# this workload; not worth plumbing dtype through the layer zoo.
