"""Probe Mosaic spellings for dynamic row gather inside a Pallas TPU kernel.
table [T,128] f32 in VMEM, ids [G] int32 (scalar-prefetch or VMEM), want
out[g] = table[ids[g]]. Each spelling compiles+runs separately."""
import functools, sys, traceback
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, G, D = 2048, 256, 128
rng = np.random.default_rng(0)
table = jnp.asarray(rng.normal(size=(T, D)).astype(np.float32))
ids_np = rng.integers(0, T, G).astype(np.int32)
ids2d = jnp.asarray(ids_np.reshape(G // 128, 128))
want = np.asarray(table)[ids_np]


def run(name, kernel, **kw):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((G, D), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY if kw.get("any")
                                   else pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(f)(table, ids2d)
        err = float(np.abs(np.asarray(out) - want).max())
        print(f"{name}: OK maxerr {err:.2e}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


# 1. table[ids] advanced indexing
def k1(tab_ref, ids_ref, out_ref):
    ids = ids_ref[...].reshape(-1)
    out_ref[...] = tab_ref[ids]

# 2. jnp.take
def k2(tab_ref, ids_ref, out_ref):
    ids = ids_ref[...].reshape(-1)
    out_ref[...] = jnp.take(tab_ref[...], ids, axis=0)

# 3. take_along_axis with broadcast indices
def k3(tab_ref, ids_ref, out_ref):
    ids = ids_ref[...].reshape(-1)
    idx = jax.lax.broadcast_in_dim(ids, (G, D), (0,))
    out_ref[...] = jnp.take_along_axis(tab_ref[...], idx, axis=0)

# 4. lax.gather explicit
def k4(tab_ref, ids_ref, out_ref):
    ids = ids_ref[...].reshape(-1, 1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,),
        start_index_map=(0,))
    out_ref[...] = jax.lax.gather(
        tab_ref[...], ids, dn, slice_sizes=(1, D))

# 5. per-row dynamic slice in a fori_loop
def k5(tab_ref, ids_ref, out_ref):
    ids = ids_ref[...]
    def body(g, _):
        i = ids[g // 128, g % 128]
        out_ref[pl.ds(g, 1), :] = tab_ref[pl.ds(i, 1), :]
        return _
    jax.lax.fori_loop(0, G, body, 0)

# 6. dynamic_slice in loop (jnp level)
def k6(tab_ref, ids_ref, out_ref):
    tab = tab_ref[...]
    ids = ids_ref[...]
    def body(g, acc):
        i = ids[g // 128, g % 128]
        row = jax.lax.dynamic_slice(tab, (i, 0), (1, D))
        return jax.lax.dynamic_update_slice(acc, row, (g, 0))
    out_ref[...] = jax.lax.fori_loop(0, G, body,
                                     jnp.zeros((G, D), jnp.float32))

for name, k in [("1 table[ids]", k1), ("2 jnp.take", k2),
                ("3 take_along_axis", k3), ("4 lax.gather", k4),
                ("5 ds-store loop", k5), ("6 dynslice loop", k6)]:
    run(name, k)
print("DONE", flush=True)
