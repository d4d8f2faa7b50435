"""Bisect which int16 construct crashes the service-side Mosaic build."""
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, B = 64, 128


def probe(name, kernel, n_out=1, scratch=None, out_dtype=jnp.int16, out_shape=None):
    x = np.arange(T * B, dtype=np.int16).reshape(T, B) % 100
    try:
        out = pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec((T, B), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                out_shape or (T, B), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(out_shape or (T, B), out_dtype),
            scratch_shapes=scratch or [],
        )(x)
        np.asarray(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:120]}", flush=True)


def k_copy(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def k_add(x_ref, o_ref):
    o_ref[:] = jnp.minimum(x_ref[:] + jnp.int16(3), jnp.int16(16384))


def k_concat(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = jnp.concatenate(
        [jnp.full((T, 1), jnp.int16(7), jnp.int16), x[:, :-1]], axis=1
    )


def k_where(x_ref, o_ref):
    x = x_ref[:]
    k = jax.lax.broadcasted_iota(jnp.int32, (T, B), 1)
    o_ref[:] = jnp.where(k < 40, x, jnp.int16(5))


def k_select(x_ref, o_ref):
    x = x_ref[:].astype(jnp.int32)
    r = jnp.select([x == 1, x == 2, x == 4, x == 8], [0, 1, 2, 3], 4)
    o_ref[:] = r.astype(jnp.int16)


def k_widen_reduce(x_ref, o_ref):
    x = x_ref[:]
    m = jnp.min(x.astype(jnp.int32), axis=1).astype(jnp.int16)
    o_ref[:] = m.reshape(T, 1)


def k_narrow_out(x_ref, o_ref):
    o_ref[:] = x_ref[:, :1]


def k_scratch(x_ref, o_ref, s_ref):
    s_ref[:] = x_ref[:]
    o_ref[:] = s_ref[:]


def k_ks_scan(x_ref, o_ref):
    chain = x_ref[:]
    inf = jnp.int16(16384)
    step = 1
    while step < B:
        moved = jnp.concatenate(
            [jnp.full((T, step), inf, jnp.int16), chain[:, :-step]], axis=1
        )
        chain = jnp.minimum(chain, jnp.minimum(moved + jnp.int16(step * 3), inf))
        step *= 2
    o_ref[:] = chain


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    probe("copy", k_copy)
    probe("add_sat", k_add)
    probe("concat_shift", k_concat)
    probe("where_iota", k_where)
    probe("select_cast", k_select)
    probe("widen_reduce", k_widen_reduce, out_shape=(T, 1))
    probe("narrow_out", k_narrow_out, out_shape=(T, 1))
    probe("scratch_i16", k_scratch, scratch=[pltpu.VMEM((T, B), jnp.int16)])
    probe("kogge_stone", k_ks_scan)
