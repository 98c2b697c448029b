"""Raw XLA take cost vs row count (chained in-jit, D=128 f32 rows).

Separates the gather bill from everything else: the chain dependency is a
single scalar (u[0,0]) folded into the *indices*, so each iteration's
gather depends on the previous one but no extra full-array traffic exists.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from pgl_tpu.utils.platform import select_platform  # noqa: E402

select_platform()
import jax                                           # noqa: E402
import jax.numpy as jnp                              # noqa: E402
import numpy as np                                   # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "..", ".jax_cache"))

N, D, R = 131072, 128, 8
x = jnp.asarray(np.random.default_rng(0).normal(size=(N, D))
                .astype(np.float32))
rng = np.random.default_rng(1)

for rows in (32768, 65536, 131072, 262144, 524288, 1048576, 2097152):
    ids = jnp.asarray(rng.integers(0, N, rows).astype(np.int32))

    @jax.jit
    def loop(x, ids):
        def body(i, c):
            s, _ = c
            u = jnp.take(x, (ids + s) % N, axis=0)
            return (u[0, 0].astype(jnp.int32) & 1, u)
        return jax.lax.fori_loop(0, R, body,
                                 (jnp.int32(0), jnp.zeros((rows, D))))

    s, u = loop(x, ids); float(u[0, 0])
    t0 = time.perf_counter()
    s, u = loop(x, ids); float(u[0, 0])
    t = (time.perf_counter() - t0) / R
    gbs = rows * D * 4 * 2 / t / 1e9
    print(f"rows={rows:8d}  {t*1e3:7.2f} ms  {t/rows*1e9:6.2f} ns/row  "
          f"{gbs:6.1f} GB/s(rd+wr)")
