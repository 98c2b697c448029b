"""Trace the GAT8 train step and print per-op device time (xplane parse
via jax._src.profiler.ProfileData)."""
import sys, os, glob, time, collections
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import optax
from pgl_tpu.datasets import powerlaw_graph
from pgl_tpu.models import GAT

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

tdir = "/tmp/gat_trace"
os.system(f"rm -rf {tdir}")
with jax.profiler.trace(tdir):
    for _ in range(4):
        params, ost, loss = step(params, ost, ga, ga.node_feat["h"], y_gat)
    float(loss)

from jax._src.profiler import ProfileData
pb = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)[0]
data = ProfileData.from_serialized_xspace(open(pb, "rb").read())
for plane in data.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
        continue
    tot = collections.Counter()
    for line in plane.lines:
        if "XLA Ops" not in line.name and "Ops" != line.name.strip():
            continue
        for ev in line.events:
            tot[ev.name] += ev.duration_ns
    if not tot:
        # fall back: aggregate all lines
        for line in plane.lines:
            for ev in line.events:
                tot[f"{line.name}::{ev.name}"] += ev.duration_ns
    print(f"== plane {plane.name}")
    s = sum(tot.values())
    for name, ns in tot.most_common(35):
        print(f"{ns/4e3:9.1f} us  {100*ns/s:5.1f}%  {name[:110]}")
    print(f"total {s/4e6:.2f} ms/step over 4 steps")
