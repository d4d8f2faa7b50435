import sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, B = 64, 128

def probe(name, kernel):
    x = (np.arange(T * B, dtype=np.int16).reshape(T, B) % 100)
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

probe("sub", lambda x_ref, o_ref: o_ref.__setitem__(slice(None), (x_ref[:] - jnp.int16(3)).astype(jnp.int16)))
probe("shr", lambda x_ref, o_ref: o_ref.__setitem__(slice(None), (x_ref[:] >> 15).astype(jnp.int16)))
probe("band", lambda x_ref, o_ref: o_ref.__setitem__(slice(None), (x_ref[:] & jnp.int16(7)).astype(jnp.int16)))
probe("vec_add", lambda x_ref, o_ref: o_ref.__setitem__(slice(None), (x_ref[:] + x_ref[:]).astype(jnp.int16)))
