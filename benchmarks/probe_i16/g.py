"""Round-4 int16 bisect, part 2: the widened-min kernel still fails service
compile, so probe the kernel's remaining int16 patterns individually:
  reduce  — int32 min-reduce along lanes, narrowed to int16 (tile,1) out
  where1d — 1-D int16 select keyed by a bool vector
  select2 — 2-D int16 select keyed by an i32-compare mask (control)
  step    — one full DP x-step exactly as _pen_kernel_x_i16 composes it
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, B = 64, 128


def probe(name, kernel, out_shape=None, scratch=None):
    x = (np.arange(T * B, dtype=np.int16).reshape(T, B) % 100).astype(np.int16)
    try:
        out = pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec((T, B), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                out_shape or (T, B), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(out_shape or (T, B), jnp.int16),
            scratch_shapes=scratch or [],
        )(x)
        np.asarray(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:110]}", flush=True)


def imin(a, b):
    a32 = a.astype(jnp.int32) if hasattr(a, "astype") else jnp.int32(a)
    b32 = b.astype(jnp.int32) if hasattr(b, "astype") else jnp.int32(b)
    return jnp.minimum(a32, b32).astype(jnp.int16)


def k_reduce(x_ref, o_ref):
    cap = jnp.min(x_ref[:].astype(jnp.int32), axis=1).astype(jnp.int16)
    o_ref[:] = cap.reshape(T, 1)


def k_where1d(x_ref, o_ref):
    cap = jnp.min(x_ref[:].astype(jnp.int32), axis=1).astype(jnp.int16)
    cond = cap > jnp.int16(0)  # int16 1-D compare!
    o_ref[:] = jnp.where(cond, cap, jnp.int16(7)).reshape(T, 1)


def k_where1d_i32cmp(x_ref, o_ref):
    cap32 = jnp.min(x_ref[:].astype(jnp.int32), axis=1)
    cond = cap32 > 0
    o_ref[:] = jnp.where(cond, cap32.astype(jnp.int16), jnp.int16(7)).reshape(T, 1)


def k_select2(x_ref, o_ref):
    k_range = jax.lax.broadcasted_iota(jnp.int32, (T, B), 1)
    o_ref[:] = jnp.where(k_range < 50, x_ref[:], jnp.int16(3))


def k_step(x_ref, o_ref, best_ref, insx_ref):
    inf = jnp.int16(16384)
    k_range = jax.lax.broadcasted_iota(jnp.int32, (T, B), 1)
    best_ref[:] = jnp.where(k_range <= 100, jnp.int16(0), inf)
    insx_ref[:] = jnp.full((T, B), inf, jnp.int16)
    best = best_ref[:]
    ins_x = insx_ref[:]
    pen = x_ref[:]
    w_valid = k_range < 120
    diag_new = jnp.where(w_valid, imin(best + pen, inf), inf)
    ins_candidates = imin(imin(ins_x + jnp.int16(18), best + jnp.int16(63)), inf)
    ins_shifted = jnp.concatenate(
        [ins_candidates[:, 1:], jnp.full((T, 1), inf, jnp.int16)], axis=1
    )
    best_after = imin(diag_new, ins_shifted)
    shifted = jnp.concatenate(
        [jnp.full((T, 1), inf, jnp.int16), best_after[:, :-1]], axis=1
    )
    chain = imin(shifted + jnp.int16(60), inf)
    step = 1
    while step < B:
        moved = jnp.concatenate(
            [jnp.full((T, step), inf, jnp.int16), chain[:, :-step]], axis=1
        )
        chain = imin(chain, imin(moved + jnp.int16(step * 15), inf))
        step *= 2
    chain = jnp.where(w_valid, chain, inf)
    best_new = imin(best_after, chain)
    best_ref[:] = best_new
    insx_ref[:] = ins_shifted
    o_ref[:] = best_new


print("backend:", jax.default_backend(), flush=True)
probe("reduce", k_reduce, out_shape=(T, 1))
probe("where1d", k_where1d, out_shape=(T, 1))
probe("where1d_i32cmp", k_where1d_i32cmp, out_shape=(T, 1))
probe("select2", k_select2)
probe(
    "step",
    k_step,
    scratch=[pltpu.VMEM((T, B), jnp.int16), pltpu.VMEM((T, B), jnp.int16)],
)
