"""Round-4 int16 bisect, part 3: which part of the composed DP step breaks
(the individual ops probe OK, the composition fails)."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, B = 64, 128


def probe(name, kernel, scratch=None):
    x = (np.arange(T * B, dtype=np.int16).reshape(T, B) % 100).astype(np.int16)
    try:
        out = pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec((T, B), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, B), jnp.int16),
            scratch_shapes=scratch or [],
        )(x)
        np.asarray(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:100]}", flush=True)


def imin(a, b):
    a32 = a.astype(jnp.int32) if hasattr(a, "astype") else jnp.int32(a)
    b32 = b.astype(jnp.int32) if hasattr(b, "astype") else jnp.int32(b)
    return jnp.minimum(a32, b32).astype(jnp.int16)


inf16 = 16384


def k_s1(x_ref, o_ref):
    inf = jnp.int16(inf16)
    k_range = jax.lax.broadcasted_iota(jnp.int32, (T, B), 1)
    best = jnp.where(k_range <= 100, jnp.int16(0), inf)
    pen = x_ref[:]
    w_valid = k_range < 120
    o_ref[:] = jnp.where(w_valid, imin(best + pen, inf), inf)


def k_s2(x_ref, o_ref):
    inf = jnp.int16(inf16)
    k_range = jax.lax.broadcasted_iota(jnp.int32, (T, B), 1)
    best = jnp.where(k_range <= 100, jnp.int16(0), inf)
    ins_x = jnp.full((T, B), inf, jnp.int16)
    pen = x_ref[:]
    w_valid = k_range < 120
    diag_new = jnp.where(w_valid, imin(best + pen, inf), inf)
    ins_candidates = imin(imin(ins_x + jnp.int16(18), best + jnp.int16(63)), inf)
    ins_shifted = jnp.concatenate(
        [ins_candidates[:, 1:], jnp.full((T, 1), inf, jnp.int16)], axis=1
    )
    o_ref[:] = imin(diag_new, ins_shifted)


def k_s3(x_ref, o_ref):
    inf = jnp.int16(inf16)
    k_range = jax.lax.broadcasted_iota(jnp.int32, (T, B), 1)
    best_after = jnp.where(k_range <= 100, x_ref[:], inf)
    shifted = jnp.concatenate(
        [jnp.full((T, 1), inf, jnp.int16), best_after[:, :-1]], axis=1
    )
    o_ref[:] = imin(shifted + jnp.int16(60), inf)


def k_s4(x_ref, o_ref):
    inf = jnp.int16(inf16)
    chain = x_ref[:]
    step = 1
    while step < B:
        moved = jnp.concatenate(
            [jnp.full((T, step), inf, jnp.int16), chain[:, :-step]], axis=1
        )
        chain = imin(chain, imin(moved + jnp.int16(step * 15), inf))
        step *= 2
    o_ref[:] = chain


print("backend:", jax.default_backend(), flush=True)
probe("s1_diag", k_s1)
probe("s2_ins", k_s2)
probe("s3_chain_open", k_s3)
probe("s4_ks_loop", k_s4)
