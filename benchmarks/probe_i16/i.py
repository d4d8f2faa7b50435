"""Round-4 int16 bisect, part 4: s1_diag decomposition."""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, B = 64, 128

def probe(name, kernel):
    x = (np.arange(T * B, dtype=np.int16).reshape(T, B) % 100).astype(np.int16)
    try:
        out = pl.pallas_call(
            kernel, grid=(1,),
            in_specs=[pl.BlockSpec((T, B), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, B), jnp.int16),
        )(x)
        np.asarray(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:90]}", flush=True)

def imin(a, b):
    a32 = a.astype(jnp.int32) if hasattr(a, "astype") else jnp.int32(a)
    b32 = b.astype(jnp.int32) if hasattr(b, "astype") else jnp.int32(b)
    return jnp.minimum(a32, b32).astype(jnp.int16)

inf16 = 16384

def k_a(x_ref, o_ref):
    # scalar-select then add
    inf = jnp.int16(inf16)
    k_range = jax.lax.broadcasted_iota(jnp.int32, (T, B), 1)
    best = jnp.where(k_range <= 100, jnp.int16(0), inf)
    o_ref[:] = (best + x_ref[:]).astype(jnp.int16)

def k_b(x_ref, o_ref):
    # add -> widened min -> narrow (no selects)
    inf = jnp.int16(inf16)
    o_ref[:] = imin(x_ref[:] + jnp.int16(3), inf)

def k_c(x_ref, o_ref):
    # select2 + imin: where(i32 mask, imin(x+3, inf), inf)
    inf = jnp.int16(inf16)
    k_range = jax.lax.broadcasted_iota(jnp.int32, (T, B), 1)
    o_ref[:] = jnp.where(k_range < 120, imin(x_ref[:] + jnp.int16(3), inf), inf)

def k_d(x_ref, o_ref):
    # scalar-select feeding an imin
    inf = jnp.int16(inf16)
    k_range = jax.lax.broadcasted_iota(jnp.int32, (T, B), 1)
    best = jnp.where(k_range <= 100, jnp.int16(0), inf)
    o_ref[:] = imin(best + x_ref[:], inf)

print("backend:", jax.default_backend(), flush=True)
probe("a_scalar_select_add", k_a)
probe("b_add_imin", k_b)
probe("c_select_of_imin", k_c)
probe("d_select_feed_imin", k_d)
