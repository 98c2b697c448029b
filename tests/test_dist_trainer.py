"""Distributed-CPU async-PS trainer topology (reference parity:
``apps/Graph4Rec/env_run/src/dist_cpu_train.py:51-66`` fleet a_sync mode,
``examples/deepwalk/train_distributed_cpu.py``).

Spawns REAL processes on localhost: 3 embedding shard servers + 4 deepwalk
trainers (plus this process) and asserts the learned embeddings beat a
fixed MacroF1 floor on a BlogCatalog-shaped multi-label synthetic — and
that training actually moved the table (vs its random init)."""

import multiprocessing as mp
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pgl_tpu.datasets import blogcatalog_shaped_graph
from pgl_tpu.distributed.ps import (EmbeddingShardService, PSEmbedding,
                                    run_shard_server, start_shard_server)

_EX = os.path.join(os.path.dirname(__file__), "..", "examples", "deepwalk")
sys.path.insert(0, _EX)


def test_ps_embedding_roundtrip_and_adagrad():
    """Single-shard service semantics: pull/push/dump with server-side
    adagrad, duplicate rows accumulating."""
    srv = start_shard_server(0, 1)
    try:
        ps = PSEmbedding([f"127.0.0.1:{srv.port}"], "t", 10, 4, lr=0.5,
                         seed=3, async_push=False)
        w0 = ps.pull([2, 7])
        g = np.ones((3, 4), np.float32)
        ps.push([2, 2, 7], g)          # row 2 gets two grads
        w1 = ps.pull([2, 7])
        assert not np.allclose(w0, w1)
        # adagrad: G=4 for row2 (two unit grads summed via add.at of g^2
        # per occurrence => 2), step size lr/sqrt(G+eps) per push entry
        full = ps.dump()
        assert full.shape == (10, 4)
        np.testing.assert_allclose(full[[2, 7]], w1, rtol=1e-6)
        ps.close()
    finally:
        srv.stop()


def test_ps_sharding_covers_all_rows():
    srvs = [start_shard_server(s, 3) for s in range(3)]
    try:
        addrs = [f"127.0.0.1:{s.port}" for s in srvs]
        ps = PSEmbedding(addrs, "emb", 101, 8, seed=1, async_push=False)
        ids = np.arange(101)
        rows = ps.pull(ids)
        full = ps.dump()
        np.testing.assert_allclose(rows, full[ids])
        # distinct shards hold distinct rows: push to one row only
        # changes that row
        before = ps.pull(ids)
        ps.push([50], np.ones((1, 8), np.float32))
        after = ps.pull(ids)
        changed = np.where(np.any(before != after, axis=1))[0]
        assert list(changed) == [50]
        ps.close()
    finally:
        for s in srvs:
            s.stop()


@pytest.mark.slow
def test_eight_process_deepwalk_macro_f1():
    """3 shard-server processes + 4 trainer processes + this one: typed
    deepwalk via Graph4RecTrainer(ps_addresses=...) reaches a MacroF1
    floor on the multi-label synthetic, far above the random-embedding
    baseline."""
    from train_distributed_cpu import _trainer_proc, macro_f1_probe

    ctx = mp.get_context("spawn")
    ready = ctx.Queue()
    servers = []
    for s in range(3):
        p = ctx.Process(target=run_shard_server,
                        args=(s, 3, 0, "127.0.0.1", ready), daemon=True)
        p.start()
        servers.append(p)
    addrs = [None] * 3
    for _ in range(3):
        sid, port = ready.get(timeout=30)
        addrs[sid] = f"127.0.0.1:{port}"
    gkw = dict(num_nodes=1000, num_groups=8, avg_degree=14)
    try:
        done = ctx.Queue()
        trainers = [ctx.Process(target=_trainer_proc,
                                args=(r, 4, addrs, 0, gkw, 4, done),
                                daemon=True) for r in range(4)]
        for p in trainers:
            p.start()
        for _ in range(4):
            rank, loss = done.get(timeout=600)
            assert np.isfinite(loss)
        for p in trainers:
            p.join(timeout=30)

        g, labels = blogcatalog_shaped_graph(seed=0, **gkw)
        emb = PSEmbedding(addrs, "emb", g.num_nodes, 32).dump()
        f1 = macro_f1_probe(emb, labels)
        rng = np.random.default_rng(0)
        f1_rand = macro_f1_probe(
            rng.normal(size=emb.shape).astype(np.float32), labels)
        assert f1 > 0.30, f"trained MacroF1 {f1:.3f} below floor"
        assert f1 > f1_rand + 0.10, (
            f"trained {f1:.3f} vs random {f1_rand:.3f}: no learning")
    finally:
        for p in servers:
            p.terminate()


def test_ps_rejects_shape_mismatch():
    svc = EmbeddingShardService(0, 1)
    svc.create_table("x", 10, 4)
    with pytest.raises(ValueError):
        svc.create_table("x", 10, 8)


def test_ps_rejects_lr_mismatch():
    svc = EmbeddingShardService(0, 1)
    svc.create_table("x", 10, 4, lr=0.1)
    with pytest.raises(ValueError):
        svc.create_table("x", 10, 4, lr=0.5)
    # lr=None attaches without asserting a value
    assert svc.create_table("x", 10, 4) is False
