"""Benchmark harness — prints ONE JSON line.

Headline metric: processed edges/s for a 3-layer GCN *training step*
(forward + backward + adam update) on a power-law graph, on the default
backend (the real TPU chip under the driver).

``vs_baseline``: ratio of the reference's published V100 GCN-Cora epoch time
(0.0047 s, BASELINE.md 'Speed' table) to our measured epoch time on a
Cora-shaped graph (2708 nodes / ~10.5k edges / 1433→16→7). >1.0 means faster
than the reference.

Robustness: the measurement body runs in a *fresh subprocess* (backend state
is per-process, so a wedged tunnel/backend init can only be retried from a
clean process) under a hard timeout, with up to 3 attempts and backoff. On
success the result is printed AND cached to ``.bench_last_good.json``; if
every attempt fails, the last-good result is re-emitted with an ``"error"``
field so the round still carries a number. rc is 0 either way.
"""

import json
import signal
import subprocess
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_REPO = os.path.dirname(os.path.abspath(__file__))
_LAST_GOOD = os.path.join(_REPO, ".bench_last_good.json")
# (timeout_s, backoff_before_s) per attempt; first is generous for cold
# remote-Mosaic compiles, later ones assume a warm persistent cache.
_ATTEMPTS = ((2400, 0), (1500, 60), (1500, 60))


def _run_worker(timeout_s):
    """One attempt: fresh interpreter, own process group (so a hung backend
    init is killed by exact pgid, never by pattern)."""
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        start_new_session=True, text=True)
    try:
        out, err = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()
        return None, f"timeout after {timeout_s}s"
    if proc.returncode != 0:
        tail = (err or out or "").strip().splitlines()[-8:]
        return None, f"rc={proc.returncode}: " + " | ".join(tail)
    for line in reversed((out or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line), None
            except json.JSONDecodeError:
                continue
    return None, "no JSON line in worker output"


def _orchestrate():
    errors = []
    for timeout_s, backoff in _ATTEMPTS:
        if backoff:
            time.sleep(backoff)
        result, err = _run_worker(timeout_s)
        if result is not None:
            print(json.dumps(result))
            try:
                with open(_LAST_GOOD, "w") as f:
                    json.dump(result, f)
            except OSError:
                pass
            return 0
        errors.append(err)
        print(f"bench attempt failed: {err}", file=sys.stderr)
    # fail-soft: re-emit the last-good number, annotated
    try:
        with open(_LAST_GOOD) as f:
            result = json.load(f)
    except (OSError, json.JSONDecodeError):
        result = {"metric": "gcn3_train_edges_per_s", "value": 0,
                  "unit": "edges/s", "vs_baseline": 0}
    result = dict(result)
    result["error"] = ("all attempts failed; value is the last-good cached "
                       "result, not this run's: " + " || ".join(errors))
    print(json.dumps(result))
    return 0


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
    # honor PGL_TPU_PLATFORM (e.g. =cpu for the small-mode smoke) — the
    # sitecustomize force-selects the tunnel backend otherwise
    from pgl_tpu.utils.platform import select_platform
    select_platform()
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
    # PGL_TPU_BENCH_SMALL=1: tiny shapes to sanity-check the harness end to
    # end on CPU (numbers are meaningless there)
    small = os.environ.get("PGL_TPU_BENCH_SMALL", "0") == "1"
    num_nodes, avg_degree, feat_dim, hidden = \
        (2048, 8, 128, 128) if small else (131072, 16, 128, 128)
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

    # --- SpMM / SDDMM speed-of-light fraction (BASELINE.json metric) ------
    # Minimal-traffic model: SpMM must read each gathered src row once
    # (E·D·4), the edge ids (E·4), and write the output (N·D·4); SDDMM
    # reads two gathered operands and writes per-edge output. Fraction =
    # model-time at HBM bandwidth / measured time (chained x_{t+1}=f(x_t)
    # inside one jit so nothing overlaps across iterations).
    hbm_gbps = float(os.environ.get("PGL_TPU_HBM_GBPS", 819.0))  # v5e
    R = 8
    D = feat_dim
    x0 = g.node_feat["h"]

    @jax.jit
    def spmm_loop(g, x):
        def body(i, x):
            y = g.send_recv(x, "sum")
            return y * (1.0 / (1.0 + jnp.max(jnp.abs(y)) * 1e-6))
        return jax.lax.fori_loop(0, R, body, x)

    o = spmm_loop(g, x0); float(o[0, 0])
    t0 = time.perf_counter()
    o = spmm_loop(g, x0); float(o[0, 0])
    t_spmm = (time.perf_counter() - t0) / R
    sol_spmm = ((E * D * 4 + E * 4 + num_nodes * D * 4) / (hbm_gbps * 1e9)
                ) / t_spmm

    @jax.jit
    def sddmm_loop(g, x):
        def body(i, x):
            y = g.send_uv(x, x, "mul")            # [E, D]
            return x + y[:x.shape[0]] * 1e-9
        return jax.lax.fori_loop(0, R, body, x)

    o = sddmm_loop(g, x0); float(o[0, 0])
    t0 = time.perf_counter()
    o = sddmm_loop(g, x0); float(o[0, 0])
    t_sddmm = (time.perf_counter() - t0) / R
    sol_sddmm = ((3 * E * D * 4 + 2 * E * 4) / (hbm_gbps * 1e9)) / t_sddmm

    # --- GAT training step (fused fwd + fused flash-style bwd) ------------
    from pgl_tpu.models import GAT
    n_gat = 2048 if small else 65536
    ga = powerlaw_graph(num_nodes=n_gat, avg_degree=16, feat_dim=128,
                        seed=1).tensor()
    E_gat = ga.num_edges
    y_gat = jnp.asarray(np.random.default_rng(1)
                        .integers(0, 16, n_gat).astype(np.int32))
    gat_model = GAT(input_size=128, num_class=16, num_heads=8,
                    hidden_size=8, feat_drop=0.0, attn_drop=0.0)
    gat_params = gat_model.init(jax.random.key(0), ga, ga.node_feat["h"])
    gat_opt = optax.adam(1e-3)
    gat_step = _build_train_step(gat_model, gat_opt)
    t_gat_step = _time_steps(gat_step, gat_params, gat_opt.init(gat_params),
                             ga, ga.node_feat["h"], y_gat, warmup=3,
                             iters=10)

    # --- minibatch GraphSAGE (host sampler + jitted bucket-padded step) ---
    from pgl_tpu import Graph
    from pgl_tpu.models import GraphSage
    from pgl_tpu.sampling import graphsage_sample
    from pgl_tpu.datasets import community_graph
    n_sage = 4096 if small else 100_000
    gs, y_all = community_graph(num_nodes=n_sage, num_classes=16,
                                feat_dim=128, avg_degree=12, seed=2)
    feat_all = np.asarray(gs.node_feat["h"])
    sage = GraphSage(input_size=128, num_class=16, num_layers=2,
                     hidden_size=128, dropout=0.0)
    B, samples = (64, (5, 5)) if small else (512, (25, 10))
    # Buckets sized to the *sampled subgraph* (~3.3k nodes at B=512 on this
    # graph), not the full graph: over-padding costs real H2D bytes per step.
    n_bucket, e_bucket = (1 << 12, 1 << 14) if small else (1 << 14, 1 << 15)

    def make_batch(nodes):
        sub, sample_index, node_index = graphsage_sample(
            gs, nodes, samples)[0]
        if sub.num_nodes > n_bucket or sub.num_edges > e_bucket:
            raise RuntimeError(
                f"bucket overflow: {sub.num_nodes}/{n_bucket} nodes "
                f"{sub.num_edges}/{e_bucket} edges")
        edges = np.full((e_bucket, 2), n_bucket - 1, np.int32)
        edges[:sub.num_edges] = np.asarray(sub.edges)
        x = np.zeros((n_bucket, 128), np.float32)
        x[:sub.num_nodes] = feat_all[sample_index]
        yb = np.zeros(n_bucket, np.int32)
        mask = np.zeros(n_bucket, np.float32)
        yb[node_index] = y_all[np.asarray(nodes)]
        mask[node_index] = 1.0
        # async H2D: device transfer overlaps the device step consuming the
        # previous batch (the prefetch thread below drives this pipeline)
        return (Graph(jax.device_put(edges), num_nodes=n_bucket),
                jax.device_put(x), jax.device_put(yb), jax.device_put(mask))

    sage_opt = optax.adam(1e-3)

    @jax.jit
    def sage_step(params, opt_state, gsub, x, yb, mask):
        def loss_fn(p):
            logits = sage.apply(p, gsub, x)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, yb)
            return (ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = sage_opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rngb = np.random.default_rng(0)
    gsub0, x_b, y_b, m_b = make_batch(rngb.choice(n_sage, B,
                                                  replace=False))
    sage_params = sage.init(jax.random.key(0), gsub0, x_b)
    sage_ost = sage_opt.init(sage_params)
    # warmup/compile
    sage_params, sage_ost, sl = sage_step(sage_params, sage_ost, gsub0,
                                          x_b, y_b, m_b)
    float(sl)
    # Real pipeline: host sampling + H2D runs in a prefetch thread (depth 2)
    # overlapped with the device step — the framework's Dataloader pattern.
    # Host work is still on the critical path if slower than the step; it is
    # timed end-to-end, just not serialized against device compute.
    import queue as _queue
    import threading as _threading
    n_batches = 16
    batch_q = _queue.Queue(maxsize=2)

    def _producer():
        for _ in range(n_batches):
            batch_q.put(make_batch(rngb.choice(n_sage, B, replace=False)))

    prod = _threading.Thread(target=_producer, daemon=True)
    t0 = time.perf_counter()
    prod.start()
    for _ in range(n_batches):
        gsub, x_b, y_b, m_b = batch_q.get()
        sage_params, sage_ost, sl = sage_step(sage_params, sage_ost, gsub,
                                              x_b, y_b, m_b)
    float(sl)
    t_sage = (time.perf_counter() - t0) / n_batches
    prod.join()
    sage_nodes_per_s = B / t_sage

    # --- device-sampled SAGE: sampling + training in ONE jit --------------
    # (the TPU-native analog of the reference's GPU NeighborSampler path:
    # padded ego blocks, no host round trip per batch)
    from pgl_tpu.models import BipartiteSAGE
    from pgl_tpu.sampling import NeighborSampler
    gs_t = gs.tensor()
    sampler = NeighborSampler(gs_t, samples=samples)
    dsage = BipartiteSAGE(input_size=128, num_class=16, num_layers=2,
                          hidden_size=128)
    feat_dev = jnp.asarray(feat_all)
    y_dev = jnp.asarray(y_all.astype(np.int32))
    seeds0 = jnp.arange(B, dtype=jnp.int32)
    sampled0, _ = sampler.sample(seeds0, jax.random.key(0))
    dparams = dsage.init(jax.random.key(1), feat_dev, seeds0, sampled0)
    dopt = optax.adam(1e-3)
    dstate = dopt.init(dparams)

    @jax.jit
    def dsage_steps(params, opt_state, key):
        # R chained steps per dispatch; each step's params feed the next,
        # so iterations cannot overlap or be served from a cache
        def body(i, carry):
            params, opt_state, key, _ = carry
            key, k1, k2 = jax.random.split(key, 3)
            seeds = jax.random.randint(k1, (B,), 0, n_sage)
            sampled, _ = sampler.sample(seeds, k2)

            def loss_fn(p):
                logits = dsage.apply(p, feat_dev, seeds, sampled)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y_dev[seeds]).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = dopt.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state, key,
                    loss)

        return jax.lax.fori_loop(0, R, body,
                                 (params, opt_state, key, jnp.float32(0)))

    dparams, dstate, _, dl = dsage_steps(dparams, dstate, jax.random.key(3))
    float(dl)  # warmup + sync
    t0 = time.perf_counter()
    dparams, dstate, _, dl = dsage_steps(dparams, dstate, jax.random.key(4))
    float(dl)
    t_dsage = (time.perf_counter() - t0) / R
    dsage_nodes_per_s = B / t_dsage

    print(json.dumps({
        "metric": "gcn3_train_edges_per_s",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs_baseline, 3),
        "detail": {
            "graph": f"powerlaw n={num_nodes} e={E} d={feat_dim} h={hidden}",
            "step_time_s": round(t_step, 5),
            "cora_epoch_s": round(t_cora, 5),
            "spmm_sol_fraction": round(sol_spmm, 4),
            "sddmm_sol_fraction": round(sol_sddmm, 4),
            "spmm_ms": round(t_spmm * 1000, 2),
            "sddmm_ms": round(t_sddmm * 1000, 2),
            "gat8_train_step_ms_1M_edges": round(t_gat_step * 1000, 1),
            "gat_train_edges_per_s": round(2 * E_gat / t_gat_step, 0),
            "sage_minibatch_nodes_per_s": round(sage_nodes_per_s, 0),
            "sage_minibatch_step_ms": round(t_sage * 1000, 1),
            "sage_device_sampled_nodes_per_s": round(dsage_nodes_per_s, 0),
            "sage_device_sampled_step_ms": round(t_dsage * 1000, 2),
            "baseline": "V100 GCN-Cora epoch 0.0047s "
                        "(legacy/docs/source/md/introduction.md:46)",
            "hbm_gbps_model": hbm_gbps,
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    if "--worker" in sys.argv or os.environ.get(
            "PGL_TPU_BENCH_NO_RETRY") == "1":
        main()
    else:
        sys.exit(_orchestrate())
