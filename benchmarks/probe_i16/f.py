"""Round-4 int16 lowering workarounds (VERDICT r3 #3): the service-side
Mosaic build crashes on int16 minimum / int16 where-compare / the
sub-and-shift arithmetic min.  Probe the remaining formulations:
  i32min   — widen to int32, minimum, narrow back (int32 min compiles)
  u16min   — unsigned-bias + uint16 minimum
  f32min   — convert to f32 (exact for all int16), minimum, convert back
  mulsel   — arithmetic select via multiply by the sign mask's low bit
  i32cmp   — compare in int32, jnp.where on int16 operands
Each probe also checks exactness against numpy."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, B = 64, 128


def probe(name, kernel, check=None):
    x = (np.arange(T * B, dtype=np.int16).reshape(T, B) % 100).astype(np.int16)
    try:
        out = pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec((T, B), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, B), jnp.int16),
        )(x)
        r = np.asarray(out)
        extra = ""
        if check is not None:
            want = check(x)
            extra = (
                " exact"
                if np.array_equal(r, want)
                else f" MISMATCH {r[0, :4]} vs {want[0, :4]}"
            )
        print(f"{name}: OK{extra}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:110]}", flush=True)


CONST = 37


def np_min(x):
    return np.minimum(x + 7, CONST).astype(np.int16)


def k_i32min(x_ref, o_ref):
    a = (x_ref[:] + jnp.int16(7)).astype(jnp.int16)
    m = jnp.minimum(a.astype(jnp.int32), jnp.int32(CONST))
    o_ref[:] = m.astype(jnp.int16)


def k_u16min(x_ref, o_ref):
    a = (x_ref[:] + jnp.int16(7)).astype(jnp.int16)
    # nonnegative DP penalties: bias unnecessary, reinterpret as uint16
    m = jnp.minimum(a.astype(jnp.uint16), jnp.uint16(CONST))
    o_ref[:] = m.astype(jnp.int16)


def k_f32min(x_ref, o_ref):
    a = (x_ref[:] + jnp.int16(7)).astype(jnp.int16)
    m = jnp.minimum(a.astype(jnp.float32), jnp.float32(CONST))
    o_ref[:] = m.astype(jnp.int16)


def k_mulsel(x_ref, o_ref):
    a = (x_ref[:] + jnp.int16(7)).astype(jnp.int16)
    b = jnp.full(a.shape, CONST, jnp.int16)
    d = (a - b).astype(jnp.int16)
    neg = ((d >> 15) & jnp.int16(1)).astype(jnp.int16)  # 1 where a < b
    o_ref[:] = (b + d * neg).astype(jnp.int16)


def k_i32cmp(x_ref, o_ref):
    a = (x_ref[:] + jnp.int16(7)).astype(jnp.int16)
    b = jnp.full(a.shape, CONST, jnp.int16)
    lt = a.astype(jnp.int32) < jnp.int32(CONST)
    o_ref[:] = jnp.where(lt, a, b)


print("backend:", jax.default_backend(), flush=True)
probe("i32min", k_i32min, check=np_min)
probe("u16min", k_u16min, check=np_min)
probe("f32min", k_f32min, check=np_min)
probe("mulsel", k_mulsel, check=np_min)
probe("i32cmp", k_i32cmp, check=np_min)
