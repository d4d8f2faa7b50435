import sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, B = 64, 128

def probe(name, kernel, out_shape=None):
    x = (np.arange(T * B, dtype=np.int16).reshape(T, B) % 100)
    try:
        out = pl.pallas_call(
            kernel, grid=(1,),
            in_specs=[pl.BlockSpec((T, B), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(out_shape or (T, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape or (T, B), jnp.int16),
        )(x)
        r = np.asarray(out)
        print(f"{name}: OK {r[0,:4]}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:100]}", flush=True)

def imin(a, b):
    return jnp.where(a < b, a, b)

def k_min_where(x_ref, o_ref):
    x = x_ref[:]
    y = x + jnp.int16(7)
    o_ref[:] = imin(y, jnp.full(x.shape, 50, jnp.int16))

def k_ks_where(x_ref, o_ref):
    chain = x_ref[:]
    inf = jnp.int16(16384)
    step = 1
    while step < B:
        moved = jnp.concatenate(
            [jnp.full((T, step), inf, jnp.int16), chain[:, :-step]], axis=1
        )
        chain = imin(chain, imin(moved + jnp.int16(step * 3), jnp.full(chain.shape, inf, jnp.int16)))
        step *= 2
    o_ref[:] = chain

def k_reduce_via_i32(x_ref, o_ref):
    x = x_ref[:]
    m = jnp.min(x.astype(jnp.int32), axis=1).astype(jnp.int16)
    o_ref[:] = m.reshape(T, 1)

print("backend:", jax.default_backend(), flush=True)
probe("min_where", k_min_where)
probe("ks_where", k_ks_where)
probe("reduce_i32", k_reduce_via_i32, out_shape=(T, 1))
