"""2-process x 4-virtual-device halo TRAINING rehearsal (VERDICT r3 #6).

Runs a full HaloGraph GCN train step under real ``jax.distributed`` with
two processes each exposing 4 virtual CPU devices (8-device global mesh),
and asserts parity of loss and gradients against the single-graph dense
reference computed in-process. Also logs the halo's analytic
``comm_bytes_per_exchange`` next to the exchange count so the comm volume
is visible in the test log.

Reference pattern: ``pgl/graph.py:1410-1553`` (DistGPUGraph edge-sharded
training with in-autodiff allreduce) at multi-host shape.
"""

import os
import socket
import subprocess
import sys
import textwrap

ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_two_process_halo_train_step(tmp_path):
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    prog = textwrap.dedent("""
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=4")
        import numpy as np
        import jax
        jax.config.update("jax_platforms", "cpu")
        rank = int(sys.argv[1]); port = sys.argv[2]
        from pgl_tpu.parallel import multihost
        multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                             num_processes=2, process_id=rank)
        assert jax.process_count() == 2
        assert len(jax.devices()) == 8, len(jax.devices())
        import jax.numpy as jnp
        from jax.sharding import Mesh
        from pgl_tpu import Graph
        from pgl_tpu.parallel.halo_graph import HaloGraph

        N, E, D, C = 96, 700, 8, 3
        rng = np.random.default_rng(11)
        edges = rng.integers(0, N, (E, 2))
        feat = rng.normal(size=(N, D)).astype(np.float32)
        y = rng.integers(0, C, N).astype(np.int32)
        w0 = rng.normal(size=(D, C)).astype(np.float32) * 0.1

        g = Graph(edges, num_nodes=N)
        mesh = Mesh(np.asarray(jax.devices()), ("node",))
        hg = HaloGraph.from_graph(g, mesh, axis="node")
        print(f"RANK{rank} comm_bytes_per_exchange="
              f"{hg.comm_bytes_per_exchange} exchanges_per_step=2 "
              f"(fwd+bwd), halo={hg.halo_size}", flush=True)

        deg = np.maximum(np.bincount(edges[:, 1], minlength=N), 1)
        dnorm = jnp.asarray((deg ** -0.5).astype(np.float32))[:, None]

        xs = hg.shard_node_values(feat)
        ys = hg.shard_node_values(y[:, None])
        ds = hg.shard_node_values(np.asarray(dnorm))
        ms = hg.shard_node_values(
            np.ones((N, 1), np.float32))     # valid-node mask

        def loss_fn(w, xs):
            h = hg.send_u_recv(xs * ds, "sum") * ds
            logits = h @ w
            # masked CE over sharded rows (pad rows masked out)
            lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
            pick = jnp.take_along_axis(logits, ys.astype(jnp.int32),
                                       axis=-1)
            ce = (lse - pick) * ms
            return ce.sum() / ms.sum()

        loss, (gw, gx) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(jnp.asarray(w0), xs)
        gx_full = hg.unshard_node_values(gx)

        # dense single-graph reference (local, unsharded)
        gt = g.tensor()
        def ref_loss(w, x):
            h = gt.send_recv(jnp.asarray(x) * dnorm, "sum") * dnorm
            logits = h @ w
            lse = jax.nn.logsumexp(logits, axis=-1)
            pick = logits[jnp.arange(N), jnp.asarray(y)]
            return (lse - pick).mean()
        rl, (rgw, rgx) = jax.value_and_grad(
            ref_loss, argnums=(0, 1))(jnp.asarray(w0), jnp.asarray(feat))

        np.testing.assert_allclose(float(loss), float(rl), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rgw),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gx_full), np.asarray(rgx),
                                   rtol=1e-4, atol=1e-5)
        print(f"RANK{rank} PASS loss={float(loss):.6f}", flush=True)
    """)
    script = tmp_path / "halo_mp.py"
    script.write_text(prog)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.abspath(ROOT))
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(r), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for r in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-4000:]}"
        assert f"RANK{r} PASS" in out, out[-4000:]
        assert "comm_bytes_per_exchange=" in out
