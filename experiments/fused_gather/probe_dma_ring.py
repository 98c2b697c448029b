"""Pipelined per-row DMA gather: K outstanding copies in a semaphore ring.
Also a batched variant: copy R consecutive-id rows per DMA when possible.
Measures achievable ns/row for HBM->VMEM random row gather."""
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import time

D = 128
TN, GN = 131072, 8192
rng = np.random.default_rng(0)
big = jnp.asarray(rng.normal(size=(TN, D)).astype(np.float32))
bids_np = rng.integers(0, TN, GN).astype(np.int32)
bids = jnp.asarray(bids_np)
bwant = np.asarray(big)[bids_np]


def make(K):
    def kern(tab_ref, ids_ref, out_ref, sems):
        def start(g):
            i = ids_ref[g]
            pltpu.make_async_copy(tab_ref.at[pl.ds(i, 1), :],
                                  out_ref.at[pl.ds(g, 1), :],
                                  sems.at[g % K]).start()

        def wait(g):
            i = ids_ref[g]
            pltpu.make_async_copy(tab_ref.at[pl.ds(i, 1), :],
                                  out_ref.at[pl.ds(g, 1), :],
                                  sems.at[g % K]).wait()

        def warm(g, _):
            start(g)
            return _
        jax.lax.fori_loop(0, K, warm, 0)

        def body(g, _):
            wait(g - K)
            start(g)
            return _
        jax.lax.fori_loop(K, GN, body, 0)

        def drain(g, _):
            wait(g)
            return _
        jax.lax.fori_loop(GN - K, GN, drain, 0)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((GN, D), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
    )


for K in (8, 32, 128):
    try:
        f = make(K)
        out = jax.jit(f)(big, bids)
        err = float(np.abs(np.asarray(out) - bwant).max())

        @jax.jit
        def rep(tab, ids, f=f):
            def body(_, acc):
                return acc + f(tab, ids)[0, 0]
            return jax.lax.fori_loop(0, 20, body, 0.0)

        float(rep(big, bids))  # warm
        t0 = time.time(); float(rep(big, bids)); t1 = time.time()
        ns = (t1 - t0) / 20 / GN * 1e9
        print(f"K={K}: maxerr {err:.1e}, {ns:.1f} ns/row", flush=True)
    except Exception as e:
        print(f"K={K}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)

# reference: XLA gather on the same shapes
@jax.jit
def xg(tab, ids):
    def body(_, acc):
        return acc + jnp.take(tab, ids, axis=0)[0, 0]
    return jax.lax.fori_loop(0, 20, body, 0.0)

float(xg(big, bids))
t0 = time.time(); float(xg(big, bids)); t1 = time.time()
print(f"XLA take: {(t1-t0)/20/GN*1e9:.1f} ns/row", flush=True)
print("DONE", flush=True)
