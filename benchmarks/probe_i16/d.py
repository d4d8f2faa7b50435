import sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, B = 64, 128

def probe(name, kernel, out_shape=None, check=None):
    x = (np.arange(T * B, dtype=np.int16).reshape(T, B) % 100)
    try:
        out = pl.pallas_call(
            kernel, grid=(1,),
            in_specs=[pl.BlockSpec((T, B), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(out_shape or (T, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape or (T, B), jnp.int16),
        )(x)
        r = np.asarray(out)
        extra = ""
        if check is not None:
            want = check(x)
            extra = " exact" if np.array_equal(r, want) else f" MISMATCH {r[0,:4]} vs {want[0,:4]}"
        print(f"{name}: OK{extra}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:100]}", flush=True)

def imin(a, b):
    d = (a - b).astype(jnp.int16)
    return (b + (d & (d >> 15))).astype(jnp.int16)

def k_amin(x_ref, o_ref):
    x = x_ref[:]
    y = (x + jnp.int16(7)).astype(jnp.int16)
    o_ref[:] = imin(y, jnp.full(x.shape, 50, jnp.int16))

def k_ks_amin(x_ref, o_ref):
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

def np_ks(x):
    chain = x.astype(np.int32)
    step = 1
    while step < B:
        moved = np.concatenate([np.full((T, step), 16384), chain[:, :-step]], axis=1)
        chain = np.minimum(chain, np.minimum(moved + step * 3, 16384))
        step *= 2
    return chain.astype(np.int16)

print("backend:", jax.default_backend(), flush=True)
probe("amin", k_amin, check=lambda x: np.minimum(x + 7, 50).astype(np.int16))
probe("ks_amin", k_ks_amin, check=np_ks)
