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
        np.asarray(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:100]}", flush=True)

def k_add_full(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = jnp.minimum(x + jnp.full(x.shape, 3, jnp.int16), jnp.full(x.shape, 16384, jnp.int16))

def k_add_only(x_ref, o_ref):
    o_ref[:] = x_ref[:] + jnp.int16(3)

def k_min_only(x_ref, o_ref):
    o_ref[:] = jnp.minimum(x_ref[:], jnp.int16(90))

def k_add_i32cast(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = jnp.minimum(x + jnp.int16(3)[None][0], x)

def k_ks_full(x_ref, o_ref):
    chain = x_ref[:]
    inf_arr = jnp.full((T, B), 16384, jnp.int16)
    step = 1
    while step < B:
        moved = jnp.concatenate(
            [jnp.full((T, step), 16384, jnp.int16), chain[:, :-step]], axis=1
        )
        stepped = jnp.minimum(moved + jnp.full((T, B), step * 3, jnp.int16), inf_arr)
        chain = jnp.minimum(chain, stepped)
        step *= 2
    o_ref[:] = chain

print("backend:", jax.default_backend(), flush=True)
probe("add_full", k_add_full)
probe("add_only_scalar", k_add_only)
probe("min_only_scalar", k_min_only)
probe("ks_full", k_ks_full)
