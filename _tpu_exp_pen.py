"""Experiment: where does gathered-scoring device time go, and does a
gather-based pen tensor beat the 192-step XLA scan?"""
import functools, time, sys
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from mapper_tpu.align import pallas_dp
from mapper_tpu.align.params import AlignmentParameters
from mapper_tpu.align.pallas_dp import _base_penalty, _pen_kernel_x, BIG
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, LQ, BAND, TILE = 2048, 192, 64, 1024
rng = np.random.default_rng(0)
q = rng.integers(1, 16, size=(B, LQ)).astype(np.int32)
w = rng.integers(1, 16, size=(B, LQ + BAND)).astype(np.int32)
n = np.full((B, 1), 150, np.int32)
m = np.full((B, 1), 150 + BAND, np.int32)
params = AlignmentParameters.defaults()
pvec = np.array([pallas_dp._params_tuple(params)], dtype=np.float32)

qd, wd, nd, md, pd = map(jax.device_put, (q, w, n, m, pvec))

def timeit(label, fn, *args, reps=8):
    out = fn(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time(); out = fn(*args); jax.block_until_ready(out); ts.append(time.time()-t0)
    ts.sort()
    print(f"{label}: median {ts[len(ts)//2]*1e3:.1f} ms  min {ts[0]*1e3:.1f} ms", flush=True)
    return out

# 1. full current program (scan pen + pallas)
f_full = functools.partial(pallas_dp._banded_scores_pallas_pen, band=BAND, tile=TILE, interpret=False)
print("compiling full (scan pen + pallas)...", flush=True)
scores_ref, diag_ref = timeit("full scan+pallas", f_full, qd, wd, nd, md, pd)

# 2. pen scan alone
@functools.partial(jax.jit, static_argnames=("band",))
def pen_scan(q_codes, w_codes, n, params_vec, band):
    mutation = params_vec[0, 0]; ambiguity = params_vec[0, 1]
    def pen_step(acc, x):
        q_char = jax.lax.dynamic_slice_in_dim(q_codes, x, 1, axis=1)
        w_slice = jax.lax.dynamic_slice_in_dim(w_codes, x, band, axis=1)
        pen_x = _base_penalty(q_char, w_slice, mutation, ambiguity)
        return acc + jnp.where(x < n, pen_x, 0.0), pen_x
    diag_sums, pen = jax.lax.scan(pen_step, jnp.zeros((q_codes.shape[0], band), jnp.float32), jnp.arange(q_codes.shape[1]))
    return diag_sums, pen
print("compiling pen scan...", flush=True)
ds_scan, pen_scan_out = timeit("pen scan alone", functools.partial(pen_scan, band=BAND), qd, wd, nd, pd)

# 3. gather-based pen
@functools.partial(jax.jit, static_argnames=("band",))
def pen_gather(q_codes, w_codes, n, params_vec, band):
    b, lq = q_codes.shape
    mutation = params_vec[0, 0]; ambiguity = params_vec[0, 1]
    idx = jnp.arange(lq)[:, None] + jnp.arange(band)[None, :]      # [LQ, BAND]
    wg = jnp.take(w_codes, idx.reshape(-1), axis=1).reshape(b, lq, band)
    pen = _base_penalty(q_codes[:, :, None], wg, mutation, ambiguity)  # [B, LQ, BAND]
    x_mask = (jnp.arange(lq)[None, :, None] < n[:, :, None])
    diag_sums = jnp.sum(jnp.where(x_mask, pen, 0.0), axis=1)
    return diag_sums, jnp.transpose(pen, (1, 0, 2))
print("compiling pen gather...", flush=True)
ds_g, pen_g = timeit("pen gather alone", functools.partial(pen_gather, band=BAND), qd, wd, nd, pd)
print("pen equal:", bool(jnp.all(pen_g == pen_scan_out)), " diag allclose:", bool(jnp.allclose(ds_g, ds_scan, atol=1e-3)), flush=True)

# 4. pallas alone on precomputed pen
def pallas_only(pen, n, m, params_vec, band, tile, lq, xchunk=1):
    b = n.shape[0]
    grid = (b // tile, lq // xchunk)
    kernel = functools.partial(_pen_kernel_x, band=band, lq=lq, xchunk=xchunk)
    out = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((xchunk, tile, band), lambda i, c: (c, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6), lambda i, c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile, band), jnp.float32),
                        pltpu.VMEM((tile, band), jnp.float32),
                        pltpu.VMEM((tile, 1), jnp.float32)],
        interpret=False,
    )(pen, n, m, params_vec)
    return out[:, 0]
pen_dev = jax.device_put(np.asarray(pen_scan_out))
f_pallas = jax.jit(functools.partial(pallas_only, band=BAND, tile=TILE, lq=LQ))
print("compiling pallas-only...", flush=True)
s_p = timeit("pallas alone (xchunk=1)", f_pallas, pen_dev, nd, md, pd)
print("scores equal:", bool(jnp.allclose(s_p, scores_ref, atol=1e-5)), flush=True)

# 5. full gather variant
@functools.partial(jax.jit, static_argnames=("band", "tile"))
def full_gather(q_codes, w_codes, n, m, params_vec, band, tile):
    ds, pen = pen_gather(q_codes, w_codes, n, params_vec, band)
    return pallas_only(pen, n, m, params_vec, band, tile, q_codes.shape[1]), ds
print("compiling full gather variant...", flush=True)
s_g, ds_g2 = timeit("full gather+pallas", functools.partial(full_gather, band=BAND, tile=TILE), qd, wd, nd, md, pd)
print("gather-variant scores equal:", bool(jnp.allclose(s_g, scores_ref, atol=1e-5)), flush=True)

# 6. gather + xchunk=8
@functools.partial(jax.jit, static_argnames=("band", "tile"))
def full_gather_x8(q_codes, w_codes, n, m, params_vec, band, tile):
    ds, pen = pen_gather(q_codes, w_codes, n, params_vec, band)
    return pallas_only(pen, n, m, params_vec, band, tile, q_codes.shape[1], xchunk=8), ds
print("compiling gather+x8...", flush=True)
s_g8, _ = timeit("full gather+pallas x8", functools.parti if False else functools.partial(full_gather_x8, band=BAND, tile=TILE), qd, wd, nd, md, pd)
print("x8 scores equal:", bool(jnp.allclose(s_g8, scores_ref, atol=1e-5)), flush=True)
print("DONE", flush=True)
