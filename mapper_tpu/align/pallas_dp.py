"""Banded affine-gap DP scoring on TPU: the extend kernel.

Scores a batch of (query, reference-window) pairs under the reference's penalty
model (AlignmentParameters.java): per-base mismatch/ambiguity penalties,
separate insertion/deletion open+extend costs, free leading/trailing reference
overhang within the window (the glocal semantics of PathAligner.java restricted
to the candidate band).  Scoring only — the few accepted candidates get their
block structure from the exact host DP (mapper_tpu.align.dp), which is the
output-parity reference.

Formulation (TPU-first):
- band coordinate k = y - x in [0, BAND); all DP state is [TILE, BAND] so the
  vector unit processes a whole tile of pairs x band positions per step;
- one sequential loop over query positions x (the only true dependency);
  deletion chains within a row are resolved with a log2(BAND)-step min-plus
  (Kogge-Stone) scan instead of a sequential walk;
- the per-base penalty is computed arithmetically from the 4-bit codes
  (popcount of the union nibble), so there are no table gathers:
      match    -> AmbiguityPenalty * (popcount(q|w) - 1) / 3
      mismatch -> MutationPenalty
- per-pair query/window lengths are handled by masking and by capturing the
  result at x == n_i, so one compiled kernel serves the whole batch.

The pure-jnp implementation (`banded_scores_reference`) runs the same math with
lax primitives on any backend and is the differential-test oracle for the
Pallas kernel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9


_INT16_BROKEN = False  # set when the backend's Mosaic build rejects int16


def _int16_disabled(interpret: bool = False) -> bool:
    """The int16 kernel is DEFAULT-ON since round 4: the service Mosaic
    build's int16 gaps (vector minimum, int16 compares, scalar-scalar
    selects — bisected in benchmarks/probe_i16/) are all avoided by
    construction (int32-widened minimum, int32 compares, int32 scalar
    selects narrowed after), verified bit-exact on the real chip
    (TPU_PARITY.json) and ~1.2-1.3x faster than f32 (band 128 becomes
    literally free: 3.09 ms vs band 64's 3.10 ms).  Failures on other
    toolchains surface as compile exceptions and auto-fall back to f32
    (_mark_int16_broken).  MAPPER_TPU_NO_INT16=1 forces f32."""
    import os

    if _INT16_BROKEN or os.environ.get("MAPPER_TPU_NO_INT16") == "1":
        return True
    return False


def _mark_int16_broken(e: Exception) -> None:
    """The current remote TPU toolchain's Mosaic build crashes on int16
    vector minimum/compare/sub ops (service-side tpu_compile_helper exit 1 —
    see BENCH.md).  On the first such failure, permanently fall back to the
    f32 kernel for this process; interpret-mode (tests) and future toolchains
    keep the int16 path."""
    global _INT16_BROKEN
    _INT16_BROKEN = True
    import sys

    print(
        f"mapper_tpu: int16 kernel unavailable on this backend "
        f"({str(e)[:120]}); using f32 kernel",
        file=sys.stderr,
        flush=True,
    )


def _base_penalty(q, w, mutation, ambiguity):
    """Vectorized penalty between 4-bit codes (int32 arrays)."""
    union = q | w
    can_match = (q & w) != 0
    popcount = (
        (union & 1) + ((union >> 1) & 1) + ((union >> 2) & 1) + ((union >> 3) & 1)
    )
    amb = ambiguity * (popcount - 1).astype(jnp.float32) / 3.0
    return jnp.where(can_match, amb, mutation)


def _roll_minus_one(arr):
    """Shift lanes left by one (lane j takes lane j+1's value; garbage wraps to
    the last lane and is masked by validity checks).  Mosaic cannot lower
    unaligned lane-dimension dynamic slices, so the kernel carries the query
    and window arrays in the loop state and rolls them one lane per step —
    every slice it takes is static."""
    return jnp.roll(arr, shift=-1, axis=1)


def _dp_step(x, state, n, m, params_tuple, band):
    """One query-position step shared by the jnp and Pallas implementations.

    state: (best, ins_x, result, q_cur, w_cur); best/ins_x [TILE, BAND],
    result [TILE], q_cur [TILE, LQ] with the current query char in lane 0,
    w_cur [TILE, LW] with window index x in lane 0; n/m [TILE, 1] int32.
    """
    best, ins_x, result, q_cur, w_cur = state
    mutation, ambiguity, ins_open, ins_ext, del_open, del_ext = params_tuple
    tile = best.shape[0]

    k_range = jax.lax.broadcasted_iota(jnp.int32, (tile, band), 1)

    # window chars consumed by a diagonal step to x+1 at band k: index x + k
    w_slice = w_cur[:, :band]
    q_char = q_cur[:, :1]
    pen = _base_penalty(q_char, w_slice, mutation, ambiguity)
    w_valid = (x + k_range) < m  # window char exists
    active = x < n  # this pair still has query chars
    diag_new = jnp.where(w_valid & active, best + pen, BIG)

    # query insertion: (x, y) -> (x+1, y): band shifts down by one
    ins_candidates = jnp.minimum(ins_x + ins_ext, best + ins_open)
    ins_shifted = jnp.concatenate(
        [ins_candidates[:, 1:], jnp.full((tile, 1), BIG, jnp.float32)], axis=1
    )
    ins_new = jnp.where(active, ins_shifted, BIG)

    best_after = jnp.minimum(diag_new, ins_new)

    # deletion chain within the new row: min-plus scan along the band
    shifted = jnp.concatenate(
        [jnp.full((tile, 1), BIG, jnp.float32), best_after[:, :-1]], axis=1
    )
    chain = shifted + del_open
    step = 1
    while step < band:
        moved = jnp.concatenate(
            [jnp.full((tile, step), BIG, jnp.float32), chain[:, :-step]], axis=1
        )
        chain = jnp.minimum(chain, moved + step * del_ext)
        step *= 2
    # deletions consume window chars: mask where the consumed char is invalid
    del_valid = (x + k_range) < m
    chain = jnp.where(del_valid & active, chain, BIG)

    best_new = jnp.minimum(best_after, chain)
    best_new = jnp.where(active, best_new, best)
    ins_x_new = jnp.where(active, ins_new, ins_x)

    # capture the score when this pair's query is fully consumed at x+1 == n
    finished = (x + 1) == n  # [TILE, 1]
    tail_valid = ((x + 1) + k_range) <= m  # window skip after the query is free
    finals = jnp.where(tail_valid, best_new, BIG)
    captured = jnp.min(finals, axis=1)  # [TILE]
    result = jnp.where(finished[:, 0], captured, result)

    return best_new, ins_x_new, result, _roll_minus_one(q_cur), _roll_minus_one(w_cur)


INF16 = 16384  # saturation "infinity" for the int16 fixed-point kernel


def _quantize_params(params, lq: int, band: int):
    """Fixed-point scale for the int16 kernel: the smallest integer scale
    <= 1024 making every penalty unit an exact integer (defaults are
    1/30-rational: mutation 1, ambiguity/3 = 1/30, ins open 2.1, ...).
    Returns (scale, int unit tuple) or None when the parameters are not
    exactly representable or a worst-case in-band score could saturate.

    Exactness: every score the kernel can produce below INF16 is an integer
    count of 1/scale units, so comparisons between kernel outputs (banded vs
    ungapped-diagonal) are exact — better than f32 accumulation order."""
    # quantize the exact float64 parameter values (the f32-rounded tuple the
    # float kernel uses is off integer multiples by ~1e-6: f32(2.1)*30 != 63)
    units = (
        float(params.mutation_penalty),
        float(params.ambiguity_penalty) / 3.0,
        float(params.insertion_start_penalty) + float(params.insertion_extension_penalty),
        float(params.insertion_extension_penalty),
        float(params.deletion_start_penalty) + float(params.deletion_extension_penalty),
        float(params.deletion_extension_penalty),
    )
    for scale in range(1, 1025):
        scaled = [u * scale for u in units]
        if all(abs(s - round(s)) < 1e-6 for s in scaled):
            ints = tuple(int(round(s)) for s in scaled)
            # saturation is monotone (penalties are non-negative, updates are
            # clamped to INF16), so any true score below the ceiling is exact
            # and saturated paths report INF16 — correct as long as every
            # penalty the engine could still accept sits below the ceiling.
            # The accept budget is query_len * MaxErrorRate (AlignmentParameters
            # .java:23-27); leave 2x headroom over the padded-length budget.
            budget = lq * max(params.max_error_rate, 0.5) * scale
            if 2 * budget >= INF16:
                return None
            # no int16 overflow before the saturating clamp: the largest
            # pre-clamp value is INF16 + band * unit (the Kogge-Stone's
            # step * del_ext term and single-unit adds)
            if INF16 + band * max(ints) >= 2**15 - 1:
                return None
            return scale, ints
    return None


def _params_tuple(params):
    # plain host floats (np.float32-rounded): creating jnp scalars here would
    # issue eager device ops, each paying a full tunnel round trip
    return tuple(
        float(np.float32(v))
        for v in (
            params.mutation_penalty,
            params.ambiguity_penalty,
            params.insertion_start_penalty + params.insertion_extension_penalty,
            params.insertion_extension_penalty,
            params.deletion_start_penalty + params.deletion_extension_penalty,
            params.deletion_extension_penalty,
        )
    )


@functools.partial(jax.jit, static_argnames=("band",))
def _banded_scores_jnp(q_codes, w_codes, n, m, params_tuple, band: int):
    tile = q_codes.shape[0]
    lq = q_codes.shape[1]
    k_range = jax.lax.broadcasted_iota(jnp.int32, (tile, band), 1)
    best0 = jnp.where(k_range <= m, 0.0, BIG).astype(jnp.float32)
    ins0 = jnp.full((tile, band), BIG, jnp.float32)
    res0 = jnp.full((tile,), BIG, jnp.float32)

    def body(x, state):
        return _dp_step(x, state, n, m, params_tuple, band)

    state0 = (best0, ins0, res0, q_codes, w_codes)
    _, _, result, _, _ = jax.lax.fori_loop(0, lq, body, state0)
    return result


def _pad_window(q_codes, w_codes, band: int):
    """The kernel slices w[x : x+band] for x < LQ; pad the window array so the
    dynamic slice never clamps (clamping would silently misalign the band)."""
    needed = q_codes.shape[1] + band
    if w_codes.shape[1] < needed:
        w_codes = jnp.pad(w_codes, ((0, 0), (0, needed - w_codes.shape[1])))
    return w_codes


def banded_scores_reference(q_codes, w_codes, n, m, params, band: int):
    """Pure-jnp banded DP scores: [B] float32 (BIG where no alignment fits the
    band).  Runs on any backend; the oracle for the Pallas kernel."""
    q_codes = jnp.asarray(q_codes, jnp.int32)
    w_codes = _pad_window(q_codes, jnp.asarray(w_codes, jnp.int32), band)
    return _banded_scores_jnp(
        q_codes,
        w_codes,
        jnp.asarray(n, jnp.int32).reshape(-1, 1),
        jnp.asarray(m, jnp.int32).reshape(-1, 1),
        _params_tuple(params),
        band,
    )


def _chunk_dp_step(x, state, q_char, w_slice, n, m, params_tuple, band):
    """The DP update with the query char / window slice supplied directly
    (chunked kernels take static in-chunk slices, avoiding per-step rolls)."""
    best, ins_x, result = state
    mutation, ambiguity, ins_open, ins_ext, del_open, del_ext = params_tuple
    tile = best.shape[0]
    k_range = jax.lax.broadcasted_iota(jnp.int32, (tile, band), 1)

    pen = _base_penalty(q_char, w_slice, mutation, ambiguity)
    w_valid = (x + k_range) < m
    active = x < n
    diag_new = jnp.where(w_valid & active, best + pen, BIG)

    ins_candidates = jnp.minimum(ins_x + ins_ext, best + ins_open)
    ins_shifted = jnp.concatenate(
        [ins_candidates[:, 1:], jnp.full((tile, 1), BIG, jnp.float32)], axis=1
    )
    ins_new = jnp.where(active, ins_shifted, BIG)

    best_after = jnp.minimum(diag_new, ins_new)

    shifted = jnp.concatenate(
        [jnp.full((tile, 1), BIG, jnp.float32), best_after[:, :-1]], axis=1
    )
    chain = shifted + del_open
    step = 1
    while step < band:
        moved = jnp.concatenate(
            [jnp.full((tile, step), BIG, jnp.float32), chain[:, :-step]], axis=1
        )
        chain = jnp.minimum(chain, moved + step * del_ext)
        step *= 2
    chain = jnp.where(w_valid & active, chain, BIG)

    best_new = jnp.minimum(best_after, chain)
    best_new = jnp.where(active, best_new, best)
    ins_x_new = jnp.where(active, ins_new, ins_x)

    finished = (x + 1) == n
    tail_valid = ((x + 1) + k_range) <= m
    finals = jnp.where(tail_valid, best_new, BIG)
    captured = jnp.min(finals, axis=1)
    result = jnp.where(finished[:, 0], captured, result)
    return best_new, ins_x_new, result


DEFAULT_CHUNK = 128  # lane-aligned x-chunk so every ref slice is statically aligned


def _pallas_kernel(
    q_ref, w_ref, n_ref, m_ref, p_ref, out_ref, best_ref, insx_ref, res_ref,
    *, band: int, chunk: int, num_chunks: int,
):
    """Grid = (batch tiles, x chunks); the DP state lives in scratch that
    persists across the (fastest-iterating) chunk dimension, so every memory
    access is a static slice of the pipelined chunk blocks — no unaligned
    dynamic slicing for Mosaic to reject, and the pipeline double-buffers the
    chunk DMAs."""
    c = pl.program_id(1)
    tile = q_ref.shape[0]
    n = n_ref[:]
    m = m_ref[:]
    params_tuple = tuple(p_ref[0, i] for i in range(6))

    @pl.when(c == 0)
    def _init():
        k_range = jax.lax.broadcasted_iota(jnp.int32, (tile, band), 1)
        best_ref[:] = jnp.where(k_range <= m, 0.0, BIG).astype(jnp.float32)
        insx_ref[:] = jnp.full((tile, band), BIG, jnp.float32)
        res_ref[:] = jnp.full((tile, 1), BIG, jnp.float32)

    state = (best_ref[:], insx_ref[:], res_ref[:][:, 0])
    q_chunk = q_ref[:]
    w_chunk = w_ref[0]
    for j in range(chunk):
        x = c * chunk + j
        state = _chunk_dp_step(
            x,
            state,
            q_chunk[:, j : j + 1],
            w_chunk[:, j : j + band],
            n,
            m,
            params_tuple,
            band,
        )
    best_ref[:], insx_ref[:], res = state
    res_ref[:] = res.reshape(tile, 1)

    @pl.when(c == num_chunks - 1)
    def _finish():
        out_ref[:] = res_ref[:]


def _pallas_kernel_roll(q_ref, w_ref, n_ref, m_ref, p_ref, out_ref, *, band: int, lq: int):
    """The roll-variant kernel: whole query/window arrays carried through the
    x loop, shifted one lane per step (same math as the jnp oracle)."""
    tile = q_ref.shape[0]
    n = n_ref[:]
    m = m_ref[:]
    params_tuple = tuple(p_ref[0, i] for i in range(6))

    k_range = jax.lax.broadcasted_iota(jnp.int32, (tile, band), 1)
    best0 = jnp.where(k_range <= m, 0.0, BIG).astype(jnp.float32)
    ins0 = jnp.full((tile, band), BIG, jnp.float32)
    res0 = jnp.full((tile,), BIG, jnp.float32)

    def body(x, state):
        return _dp_step(x, state, n, m, params_tuple, band)

    state0 = (best0, ins0, res0, q_ref[:], w_ref[:])
    _, _, result, _, _ = jax.lax.fori_loop(0, lq, body, state0)
    out_ref[:] = result.reshape(tile, 1)


@functools.partial(jax.jit, static_argnames=("band", "tile", "interpret"))
def _banded_scores_pallas_roll(q_codes, w_codes, n, m, params_vec, band, tile, interpret):
    q_codes = q_codes.astype(jnp.int32)
    w_codes = w_codes.astype(jnp.int32)
    b = q_codes.shape[0]
    lq = q_codes.shape[1]
    lw = w_codes.shape[1]
    grid = (b // tile,)
    kernel = functools.partial(_pallas_kernel_roll, band=band, lq=lq)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, lq), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, lw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        interpret=interpret,
    )(q_codes, w_codes, n, m, params_vec)
    return out[:, 0]


@functools.partial(jax.jit, static_argnames=("band", "tile", "interpret", "chunk"))
def _banded_scores_pallas(q_codes, w_chunks, n, m, params_vec, band, tile, interpret, chunk):
    b = q_codes.shape[0]
    lq = q_codes.shape[1]
    num_chunks = lq // chunk
    grid = (b // tile, num_chunks)
    kernel = functools.partial(
        _pallas_kernel, band=band, chunk=chunk, num_chunks=num_chunks
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, chunk), lambda i, c: (i, c), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tile, chunk + band), lambda i, c: (c, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tile, 1), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6), lambda i, c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile, band), jnp.float32),
            pltpu.VMEM((tile, band), jnp.float32),
            pltpu.VMEM((tile, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q_codes, w_chunks, n, m, params_vec)
    return out[:, 0]


def _pen_kernel_x(
    pen_ref, n_ref, m_ref, p_ref, out_ref, best_ref, insx_ref, res_ref,
    *, band: int, lq: int, xchunk: int,
):
    """The pen kernel with `xchunk` query positions per grid step: the DP
    update is unrolled over the chunk so the (substantial) per-grid-step
    pipeline overhead is amortized.  pen block [XCHUNK, TILE, BAND]."""
    c = pl.program_id(1)
    tile = best_ref.shape[0]
    n = n_ref[:]
    m = m_ref[:]
    _mut, _amb, ins_open, ins_ext, del_open, del_ext = tuple(
        p_ref[0, i] for i in range(6)
    )
    k_range = jax.lax.broadcasted_iota(jnp.int32, (tile, band), 1)

    @pl.when(c == 0)
    def _init():
        best_ref[:] = jnp.where(k_range <= m, 0.0, BIG).astype(jnp.float32)
        insx_ref[:] = jnp.full((tile, band), BIG, jnp.float32)
        res_ref[:] = jnp.full((tile, 1), BIG, jnp.float32)

    best = best_ref[:]
    ins_x = insx_ref[:]
    result = res_ref[:][:, 0]
    for j in range(xchunk):
        x = c * xchunk + j
        pen = pen_ref[j]
        w_valid = (x + k_range) < m
        active = x < n
        diag_new = jnp.where(w_valid & active, best + pen, BIG)

        ins_candidates = jnp.minimum(ins_x + ins_ext, best + ins_open)
        ins_shifted = jnp.concatenate(
            [ins_candidates[:, 1:], jnp.full((tile, 1), BIG, jnp.float32)], axis=1
        )
        ins_new = jnp.where(active, ins_shifted, BIG)

        best_after = jnp.minimum(diag_new, ins_new)

        # deletion chain: min-plus Kogge-Stone scan (identical float math to
        # the jnp oracle — the formulations must stay bit-for-bit equal)
        shifted = jnp.concatenate(
            [jnp.full((tile, 1), BIG, jnp.float32), best_after[:, :-1]], axis=1
        )
        chain = shifted + del_open
        step = 1
        while step < band:
            moved = jnp.concatenate(
                [jnp.full((tile, step), BIG, jnp.float32), chain[:, :-step]], axis=1
            )
            chain = jnp.minimum(chain, moved + step * del_ext)
            step *= 2
        chain = jnp.where(w_valid & active, chain, BIG)

        best_new = jnp.minimum(best_after, chain)
        best = jnp.where(active, best_new, best)
        ins_x = jnp.where(active, ins_new, ins_x)

        finished = (x + 1) == n
        tail_valid = ((x + 1) + k_range) <= m
        finals = jnp.where(tail_valid, best, BIG)
        captured = jnp.min(finals, axis=1)
        result = jnp.where(finished[:, 0], captured, result)

    best_ref[:] = best
    insx_ref[:] = ins_x
    res_ref[:] = result.reshape(tile, 1)

    @pl.when(c == (lq // xchunk) - 1)
    def _finish():
        out_ref[:] = res_ref[:]


def _pen_kernel_x_i16(
    pen_ref, n_ref, m_ref, out_ref, best_ref, insx_ref, res_ref,
    *, band: int, lq: int, xchunk: int, ints: tuple,
):
    """Fixed-point variant of the pen kernel: all DP state is int16 in units
    of 1/scale (see _quantize_params), with saturating adds clamped to INF16.
    Halves the vector registers per op vs float32 — the kernel is issue-bound
    (measured: band 128 costs ~13% more than band 64 at 2x the cells), so
    fewer/denser vregs is the main throughput lever.  The integer penalty
    units are compile-time constants (they come from the static quantizer
    result), sidestepping int16 scalar loads.

    The service toolchain crashes on int16 vector minimum (bisected in
    benchmarks/probe_i16/), so every minimum here widens to int32 and
    narrows back (_imin16 — probed to compile and produce exact results);
    adds stay int16 (INF16=16384 leaves 2x headroom, no overflow before the
    min), so state storage and most traffic keep the int16 density."""

    def _imin16(a, b):
        a32 = a.astype(jnp.int32) if hasattr(a, "astype") else jnp.int32(a)
        b32 = b.astype(jnp.int32) if hasattr(b, "astype") else jnp.int32(b)
        return jnp.minimum(a32, b32).astype(jnp.int16)
    c = pl.program_id(1)
    tile = best_ref.shape[0]
    n = n_ref[:]
    m = m_ref[:]
    inf = jnp.int16(INF16)
    ins_open = jnp.int16(ints[2])
    ins_ext = jnp.int16(ints[3])
    del_open = jnp.int16(ints[4])
    del_ext = jnp.int16(ints[5])
    k_range = jax.lax.broadcasted_iota(jnp.int32, (tile, band), 1)

    @pl.when(c == 0)
    def _init():
        # a select between two int16 SCALAR broadcasts crashes the service
        # Mosaic build (bisected in benchmarks/probe_i16/i.py); select in
        # int32 and narrow instead
        best_ref[:] = jnp.where(
            k_range <= m, jnp.int32(0), jnp.int32(INF16)
        ).astype(jnp.int16)
        insx_ref[:] = jnp.full((tile, band), inf, jnp.int16)
        res_ref[:] = jnp.full((tile, 1), inf, jnp.int16)

    best = best_ref[:]
    ins_x = insx_ref[:]
    result = res_ref[:][:, 0]
    for j in range(xchunk):
        x = c * xchunk + j
        pen = pen_ref[j]
        w_valid = (x + k_range) < m
        active = x < n
        diag_new = jnp.where(
            w_valid & active, _imin16(best + pen, inf), inf
        )

        ins_candidates = _imin16(
            _imin16(ins_x + ins_ext, best + ins_open), inf
        )
        ins_shifted = jnp.concatenate(
            [ins_candidates[:, 1:], jnp.full((tile, 1), inf, jnp.int16)], axis=1
        )
        ins_new = jnp.where(active, ins_shifted, inf)

        best_after = _imin16(diag_new, ins_new)

        shifted = jnp.concatenate(
            [jnp.full((tile, 1), inf, jnp.int16), best_after[:, :-1]], axis=1
        )
        chain = _imin16(shifted + del_open, inf)
        step = 1
        while step < band:
            moved = jnp.concatenate(
                [jnp.full((tile, step), inf, jnp.int16), chain[:, :-step]], axis=1
            )
            chain = _imin16(
                chain, _imin16(moved + jnp.int16(step * ints[5]), inf)
            )
            step *= 2
        chain = jnp.where(w_valid & active, chain, inf)

        best_new = _imin16(best_after, chain)
        best = jnp.where(active, best_new, best)
        ins_x = jnp.where(active, ins_new, ins_x)

        finished = (x + 1) == n
        tail_valid = ((x + 1) + k_range) <= m
        finals = jnp.where(tail_valid, best, inf)
        # Mosaic has no int16 reductions; widen just the capture reduce
        captured = jnp.min(finals.astype(jnp.int32), axis=1).astype(jnp.int16)
        result = jnp.where(finished[:, 0], captured, result)

    best_ref[:] = best
    insx_ref[:] = ins_x
    res_ref[:] = result.reshape(tile, 1)

    @pl.when(c == (lq // xchunk) - 1)
    def _finish():
        out_ref[:] = res_ref[:]


def _base_penalty_i16(q, w, mutation_i, amb_unit_i):
    """Integer penalty units between 4-bit codes: amb_unit per extra union
    bit when compatible, mutation units otherwise (int32 in, int16 out)."""
    union = q | w
    can_match = (q & w) != 0
    popcount = (
        (union & 1) + ((union >> 1) & 1) + ((union >> 2) & 1) + ((union >> 3) & 1)
    )
    return jnp.where(can_match, amb_unit_i * (popcount - 1), mutation_i).astype(jnp.int16)


def _pen_core_i16(q_codes, w_codes, n, m, ints, band, tile, interpret, xchunk=1):
    """Fixed-point pen pipeline: int16 penalty tensor streamed through the
    grid, int16 DP state, exact int32 per-diagonal ungapped sums.  `ints` is
    the static integer-unit tuple from _quantize_params; outputs stay in
    scaled integer units (callers divide by the scale)."""
    b = q_codes.shape[0]
    lq = q_codes.shape[1]
    mutation_i = jnp.int32(ints[0])
    amb_unit_i = jnp.int32(ints[1])

    def pen_step(acc, x):
        q_char = jax.lax.dynamic_slice_in_dim(q_codes, x, 1, axis=1)
        w_slice = jax.lax.dynamic_slice_in_dim(w_codes, x, band, axis=1)
        pen_x = _base_penalty_i16(q_char, w_slice, mutation_i, amb_unit_i)
        acc = acc + jnp.where(x < n, pen_x.astype(jnp.int32), 0)
        return acc, pen_x

    diag_sums, pen = jax.lax.scan(
        pen_step, jnp.zeros((b, band), jnp.int32), jnp.arange(lq)
    )

    while xchunk > 1 and (lq % xchunk != 0 or xchunk * tile * band * 2 > 2 * 2**20):
        xchunk //= 2
    grid = (b // tile, lq // xchunk)
    kernel = functools.partial(
        _pen_kernel_x_i16, band=band, lq=lq, xchunk=xchunk, ints=tuple(ints)
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (xchunk, tile, band), lambda i, c: (c, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tile, 1), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.int16),
        scratch_shapes=[
            pltpu.VMEM((tile, band), jnp.int16),
            pltpu.VMEM((tile, band), jnp.int16),
            pltpu.VMEM((tile, 1), jnp.int16),
        ],
        interpret=interpret,
    )(pen, n, m)
    return out[:, 0], diag_sums


HALF = 64  # the packed kernel's per-candidate band


def _pen_kernel_x_i16_packed(
    pen_ref, nl_ref, ml_ref, n2_ref, m2_ref, out_ref, best_ref, insx_ref,
    res_ref, *, lq: int, xchunk: int, ints: tuple,
):
    """Two band-64 candidates per 128-lane row: lanes [0,64) carry candidate
    A, [64,128) candidate B.  A lane barrier at the half boundary keeps the
    deletion chain and the insertion shift from crossing halves, so each
    half's DP is bit-identical to the band-64 kernel's.  The f32 kernel is
    vector-issue-bound and band 128 costs the same wall time as band 64
    (BENCH.md), so packing doubles effective-band-64 throughput.
    nl/ml are lane-mapped per-half n/m ([tile, 128]); n2/m2 are the compact
    [tile, 2] copies for the scalar capture logic."""
    band = 2 * HALF
    c = pl.program_id(1)
    tile = best_ref.shape[0]
    inf = jnp.int16(INF16)
    ins_open = jnp.int16(ints[2])
    ins_ext = jnp.int16(ints[3])
    del_open = jnp.int16(ints[4])
    k_range = jax.lax.broadcasted_iota(jnp.int32, (tile, band), 1)
    sub = k_range & (HALF - 1)  # lane index within the half
    n_lane = nl_ref[:]
    m_lane = ml_ref[:]

    def _imin16(a, b):
        a32 = a.astype(jnp.int32) if hasattr(a, "astype") else jnp.int32(a)
        b32 = b.astype(jnp.int32) if hasattr(b, "astype") else jnp.int32(b)
        return jnp.minimum(a32, b32).astype(jnp.int16)

    @pl.when(c == 0)
    def _init():
        best_ref[:] = jnp.where(
            sub <= m_lane, jnp.int32(0), jnp.int32(INF16)
        ).astype(jnp.int16)
        insx_ref[:] = jnp.full((tile, band), inf, jnp.int16)
        res_ref[:] = jnp.full((tile, 2), inf, jnp.int16)

    best = best_ref[:]
    ins_x = insx_ref[:]
    res = res_ref[:]
    for j in range(xchunk):
        x = c * xchunk + j
        pen = pen_ref[j]
        w_valid = (x + sub) < m_lane
        active = x < n_lane
        diag_new = jnp.where(w_valid & active, _imin16(best + pen, inf), inf)

        ins_candidates = _imin16(_imin16(ins_x + ins_ext, best + ins_open), inf)
        ins_shifted = jnp.concatenate(
            [ins_candidates[:, 1:], jnp.full((tile, 1), inf, jnp.int16)], axis=1
        )
        # lane HALF-1 would receive lane HALF (the other candidate): barrier
        # (scalar-vs-array int16 select compiles; only scalar-scalar crashes)
        ins_shifted = jnp.where(sub == HALF - 1, inf, ins_shifted)
        ins_new = jnp.where(active, ins_shifted, inf)

        best_after = _imin16(diag_new, ins_new)

        shifted = jnp.concatenate(
            [jnp.full((tile, 1), inf, jnp.int16), best_after[:, :-1]], axis=1
        )
        shifted = jnp.where(sub < 1, inf, shifted)
        chain = _imin16(shifted + del_open, inf)
        step = 1
        while step < HALF:  # within-half propagation only
            moved = jnp.concatenate(
                [jnp.full((tile, step), inf, jnp.int16), chain[:, :-step]], axis=1
            )
            moved = jnp.where(sub < step, inf, moved)
            chain = _imin16(chain, _imin16(moved + jnp.int16(step * ints[5]), inf))
            step *= 2
        chain = jnp.where(w_valid & active, chain, inf)

        best_new = _imin16(best_after, chain)
        best = jnp.where(active, best_new, best)
        ins_x = jnp.where(active, ins_new, ins_x)

        tail_valid = ((x + 1) + sub) <= m_lane
        finals = jnp.where(tail_valid, best, inf).astype(jnp.int32)
        cap_a = jnp.min(
            jnp.where(k_range < HALF, finals, jnp.int32(INF16)), axis=1
        ).astype(jnp.int16)
        cap_b = jnp.min(
            jnp.where(k_range >= HALF, finals, jnp.int32(INF16)), axis=1
        ).astype(jnp.int16)
        fin_a = (x + 1) == n2_ref[:, 0:1]
        fin_b = (x + 1) == n2_ref[:, 1:2]
        res = jnp.concatenate(
            [
                jnp.where(fin_a, cap_a.reshape(tile, 1), res[:, 0:1]),
                jnp.where(fin_b, cap_b.reshape(tile, 1), res[:, 1:2]),
            ],
            axis=1,
        )

    best_ref[:] = best
    insx_ref[:] = ins_x
    res_ref[:] = res

    @pl.when(c == (lq // xchunk) - 1)
    def _finish():
        out_ref[:] = res_ref[:]


def _pen_core_i16_packed(qA, wA, nA, mA, qB, wB, nB, mB, ints, tile, interpret, xchunk=1):
    """Packed-pair variant of _pen_core_i16 at effective band 64: candidate
    A of each kernel row occupies lanes [0, 64), candidate B lanes [64, 128).
    Callers split the batch into the two halves HOST-side (contiguous
    slices) — device-side strided gathers were measured to cost more than
    the kernel itself saves."""
    hb = qA.shape[0]
    lq = qA.shape[1]
    band = 2 * HALF
    mutation_i = jnp.int32(ints[0])
    amb_unit_i = jnp.int32(ints[1])

    # one scan computes both halves' penalty rows (two scans double the
    # per-step scan overhead, which dominates at these shapes)
    def pen_step(carry, x):
        accA, accB = carry
        qa = jax.lax.dynamic_slice_in_dim(qA, x, 1, axis=1)
        wa = jax.lax.dynamic_slice_in_dim(wA, x, HALF, axis=1)
        pA = _base_penalty_i16(qa, wa, mutation_i, amb_unit_i)
        qb = jax.lax.dynamic_slice_in_dim(qB, x, 1, axis=1)
        wb = jax.lax.dynamic_slice_in_dim(wB, x, HALF, axis=1)
        pB = _base_penalty_i16(qb, wb, mutation_i, amb_unit_i)
        accA = accA + jnp.where(x < nA, pA.astype(jnp.int32), 0)
        accB = accB + jnp.where(x < nB, pB.astype(jnp.int32), 0)
        return (accA, accB), jnp.concatenate([pA, pB], axis=1)

    zero = jnp.zeros((hb, HALF), jnp.int32)
    (diagA, diagB), pen = jax.lax.scan(pen_step, (zero, zero), jnp.arange(lq))

    ones = jnp.ones((1, HALF), jnp.int32)
    n_lane = jnp.concatenate([nA * ones, nB * ones], axis=1)  # [hb, 128]
    m_lane = jnp.concatenate([mA * ones, mB * ones], axis=1)
    n2 = jnp.concatenate([nA, nB], axis=1)  # [hb, 2]
    m2 = jnp.concatenate([mA, mB], axis=1)

    while xchunk > 1 and (lq % xchunk != 0 or xchunk * tile * band * 2 > 2 * 2**20):
        xchunk //= 2
    grid = (hb // tile, lq // xchunk)
    kernel = functools.partial(
        _pen_kernel_x_i16_packed, lq=lq, xchunk=xchunk, ints=tuple(ints)
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (xchunk, tile, band), lambda i, c: (c, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tile, band), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, band), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 2), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hb, 2), jnp.int16),
        scratch_shapes=[
            pltpu.VMEM((tile, band), jnp.int16),
            pltpu.VMEM((tile, band), jnp.int16),
            pltpu.VMEM((tile, 2), jnp.int16),
        ],
        interpret=interpret,
    )(pen, n_lane, m_lane, n2, m2)
    # out [hb, 2]: column 0 = the A half, column 1 = the B half
    return out[:, 0], out[:, 1], diagA, diagB


@functools.partial(jax.jit, static_argnames=("tile", "interpret", "quant"))
def _banded_scores_pallas_pen_i16_packed(qA, wA, nA, mA, qB, wB, nB, mB, tile, interpret, quant):
    """Packed fixed-point pen entry (effective band 64, two candidates per
    128-lane row); the caller splits/reassembles halves host-side."""
    scale, ints = quant
    sA, sB, dA, dB = _pen_core_i16_packed(
        qA.astype(jnp.int32), wA.astype(jnp.int32), nA, mA,
        qB.astype(jnp.int32), wB.astype(jnp.int32), nB, mB,
        ints, tile, interpret,
    )
    inv = np.float32(1.0) / np.float32(scale)

    def fin(si):
        return jnp.where(si >= INF16, BIG, si.astype(jnp.float32) * inv)

    return fin(sA), fin(sB), dA.astype(jnp.float32) * inv, dB.astype(jnp.float32) * inv


def _pen_core(q_codes, w_codes, n, m, params_vec, band, tile, interpret, xchunk=1):
    # xchunk > 1 amortizes grid-step overhead but was measured a wash on real
    # hardware (device/tunnel variance dominates) and Mosaic stack-allocates
    # the unrolled intermediates (~6 [tile,band] temps per step), so the
    # default stays 1; the knob remains for future tuning
    """Shared body of the pen-variant entries: int32 device codes in,
    (scores [B], diag_sums [B, BAND]) out."""
    b = q_codes.shape[0]
    lq = q_codes.shape[1]
    # penalty tensor [LQ, B, BAND] built with a bounded scan (a naive window
    # stack makes XLA materialize catastrophically large intermediates); the
    # scan also accumulates the per-diagonal ungapped sums for free
    mutation = params_vec[0, 0]
    ambiguity = params_vec[0, 1]

    def pen_step(acc, x):
        q_char = jax.lax.dynamic_slice_in_dim(q_codes, x, 1, axis=1)
        w_slice = jax.lax.dynamic_slice_in_dim(w_codes, x, band, axis=1)
        pen_x = _base_penalty(q_char, w_slice, mutation, ambiguity)
        acc = acc + jnp.where(x < n, pen_x, 0.0)
        return acc, pen_x

    diag_sums, pen = jax.lax.scan(
        pen_step, jnp.zeros((b, band), jnp.float32), jnp.arange(lq)
    )  # diag_sums [B, BAND]: ungapped penalty per window diagonal

    # xchunk query positions per grid step (VMEM-bounded): the per-grid-step
    # pipeline overhead dominates a one-x-per-step grid
    while xchunk > 1 and (lq % xchunk != 0 or xchunk * tile * band * 4 > 2 * 2**20):
        xchunk //= 2
    grid = (b // tile, lq // xchunk)
    kernel = functools.partial(_pen_kernel_x, band=band, lq=lq, xchunk=xchunk)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (xchunk, tile, band), lambda i, c: (c, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tile, 1), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6), lambda i, c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile, band), jnp.float32),
            pltpu.VMEM((tile, band), jnp.float32),
            pltpu.VMEM((tile, 1), jnp.float32),
        ],
        interpret=interpret,
    )(pen, n, m, params_vec)
    return out[:, 0], diag_sums


@functools.partial(jax.jit, static_argnames=("band", "tile", "interpret", "quant"))
def _banded_scores_pallas_pen_i16(q_codes, w_codes, n, m, band, tile, interpret, quant):
    """Fixed-point pen entry: uint8 codes in, (scores [B] f32, diag_sums
    [B, BAND] f32) out in unscaled penalty units.  `quant` is the static
    (scale, int-units) pair from _quantize_params."""
    scale, ints = quant
    scores_i, diag_i = _pen_core_i16(
        q_codes.astype(jnp.int32), w_codes.astype(jnp.int32), n, m,
        ints, band, tile, interpret,
    )
    inv = np.float32(1.0) / np.float32(scale)
    scores = jnp.where(
        scores_i >= INF16, BIG, scores_i.astype(jnp.float32) * inv
    )
    return scores, diag_i.astype(jnp.float32) * inv


@functools.partial(jax.jit, static_argnames=("band", "tile", "interpret"))
def _banded_scores_pallas_pen(q_codes, w_codes, n, m, params_vec, band, tile, interpret):
    # accept uint8 codes: converting on-device inside this jit keeps the wire
    # transfer small and avoids eager dispatches (each one pays the remote
    # tunnel's round trip)
    return _pen_core(
        q_codes.astype(jnp.int32), w_codes.astype(jnp.int32), n, m, params_vec,
        band, tile, interpret,
    )


def _gathered_core(
    reads_u8, concat_u8, read_id, reversed_, win_start, lane, n, m, params_vec,
    *, band, tile, interpret, use_pallas, quant=None,
):
    """Fused candidate scoring against a device-resident reference.

    reads_u8 [R, LQ] uint8 (0-padded rows, forward orientation only);
    concat_u8 [N] uint8: the concatenated reference codes, uploaded once;
    read_id/reversed_/win_start/lane/n/m: per-candidate int32/bool arrays.

    Everything the host used to precompute per candidate — RC'd query codes,
    gathered reference windows, the voted diagonal's ungapped penalty — is
    computed on-device, so one call moves only the read matrix plus O(B)
    index vectors over the (slow, high-jitter) TPU tunnel and returns two
    [B] float32 vectors.  With use_pallas=False the same math runs on pure
    XLA ops (any backend; also the path a CPU test mesh shards)."""
    lq = reads_u8.shape[1]
    b = read_id.shape[0]
    q_fwd = reads_u8[read_id].astype(jnp.int32)  # [B, LQ]
    # reverse complement on device: complement = nibble bit-reversal
    # (basepairs.COMPLEMENT_TABLE), order reversed over the first n chars
    comp = (
        ((q_fwd & 1) << 3) | ((q_fwd & 2) << 1) | ((q_fwd & 4) >> 1) | ((q_fwd & 8) >> 3)
    )
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, lq), 1)
    rc_idx = jnp.clip(n - 1 - pos, 0, lq - 1)
    rc = jnp.take_along_axis(comp, rc_idx, axis=1)
    rc = jnp.where(pos < n, rc, 0)
    q_codes = jnp.where(reversed_[:, None], rc, q_fwd)

    w_idx = win_start[:, None] + jnp.arange(lq + band, dtype=win_start.dtype)[None, :]
    w_idx = jnp.minimum(w_idx, concat_u8.shape[0] - 1)
    w_codes = concat_u8[w_idx].astype(jnp.int32)

    if use_pallas and quant is not None:
        scores_i, diag_i = _pen_core_i16(
            q_codes, w_codes, n, m, quant[1], band, tile, interpret
        )
        inv = np.float32(1.0) / np.float32(quant[0])
        scores = jnp.where(scores_i >= INF16, BIG, scores_i.astype(jnp.float32) * inv)
        diag_sums = diag_i.astype(jnp.float32) * inv
    elif use_pallas:
        scores, diag_sums = _pen_core(
            q_codes, w_codes, n, m, params_vec, band, tile, interpret
        )
    else:
        params_tuple = tuple(params_vec[0, i] for i in range(6))
        scores = _banded_scores_jnp(q_codes, w_codes, n, m, params_tuple, band)

        def pen_step(acc, x):
            q_char = jax.lax.dynamic_slice_in_dim(q_codes, x, 1, axis=1)
            w_slice = jax.lax.dynamic_slice_in_dim(w_codes, x, band, axis=1)
            pen_x = _base_penalty(q_char, w_slice, params_vec[0, 0], params_vec[0, 1])
            return acc + jnp.where(x < n, pen_x, 0.0), None

        diag_sums, _ = jax.lax.scan(
            pen_step, jnp.zeros((b, band), jnp.float32), jnp.arange(lq)
        )
    ungapped = diag_sums[jnp.arange(b), jnp.clip(lane, 0, band - 1)]
    # one stacked output -> one device-to-host fetch (each fetch pays a full
    # tunnel round trip, ~25 ms on the remote TPU; see BENCH.md)
    return jnp.stack([scores, ungapped])


_GATHERED_FNS: dict = {}


def _gathered_fn(mesh, band, tile, interpret, use_pallas, quant=None):
    """The jitted (and, under a mesh, shard_mapped over the data axis)
    gathered-scoring callable, cached per configuration."""
    key = (mesh, band, tile, interpret, use_pallas, quant)
    fn = _GATHERED_FNS.get(key)
    if fn is not None:
        return fn
    core = functools.partial(
        _gathered_core, band=band, tile=tile, interpret=interpret,
        use_pallas=use_pallas, quant=quant,
    )
    if mesh is None:
        fn = jax.jit(core)
    else:
        from jax.sharding import PartitionSpec as P

        from mapper_tpu.parallel.mesh import _shard_map

        row = P("data")
        rep = P()
        fn = jax.jit(
            _shard_map(
                core,
                mesh=mesh,
                in_specs=(rep, rep, row, row, row, row, P("data", None), P("data", None), rep),
                out_specs=P(None, "data"),
            )
        )
    _GATHERED_FNS[key] = fn
    return fn


def banded_scores_gathered(
    reads_u8,
    concat_dev,
    read_id,
    reversed_,
    win_start,
    lane,
    n,
    m,
    params,
    band: int,
    tile: int = 1024,
    interpret: bool = False,
    read_bucket: int = 256,
    mesh=None,
    use_pallas: bool | None = None,
    stacked: bool = False,
):
    """Host wrapper for the gathered scorer: pads the candidate count to a
    tile (× mesh size) multiple and the read count to `read_bucket` (stable
    compile-size buckets), builds the params vector, returns
    numpy-convertible device futures (banded [B], ungapped-at-lane [B]).
    `concat_dev` must be a device-resident uint8 array (jax.device_put once
    per index; replicated over the mesh when one is given).  With a mesh the
    candidate rows shard over its `data` axis — scoring is embarrassingly
    parallel, so no collectives appear.

    With stacked=True, returns the single [2, padded_B] device array
    (row 0 banded, row 1 ungapped-at-lane, padded tail included) with its
    device-to-host copy already started: the remote tunnel charges a ~25 ms
    round trip per fetch, so callers that fetch asynchronously during later
    host work (batch/engine.py's pipeline) see a near-zero materialize cost
    and exactly one fetch."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    reads_u8 = np.asarray(reads_u8, dtype=np.uint8)
    r, lq = reads_u8.shape
    padded_r = -(-r // read_bucket) * read_bucket
    if padded_r != r:
        reads_host = np.zeros((padded_r, lq), dtype=np.uint8)
        reads_host[:r] = reads_u8
    else:
        reads_host = reads_u8
    b = int(np.asarray(read_id).shape[0])
    quantum = tile * (mesh.size if mesh is not None else 1)
    padded_b = -(-b // quantum) * quantum

    def pad1(a, dtype, fill):
        out = np.full(padded_b, fill, dtype=dtype)
        out[:b] = np.asarray(a)
        return out

    # int32 window indices: callers must fall back to the host-window path
    # for references beyond 2^31 bases (JAX x64 is off; int64 would truncate)
    if int(concat_dev.shape[0]) + lq + band > 2**31 - 1:
        raise ValueError("reference too large for int32 device gather")
    read_id_p = pad1(read_id, np.int32, 0)
    reversed_p = pad1(reversed_, bool, False)
    win_start_p = pad1(win_start, np.int32, 0)
    lane_p = pad1(lane, np.int32, 0)
    n_p = pad1(n, np.int32, 1).reshape(-1, 1)
    m_p = pad1(m, np.int32, 1).reshape(-1, 1)
    params_vec = np.array([[float(v) for v in _params_tuple(params)]], dtype=np.float32)
    quant = None
    if use_pallas and not _int16_disabled(interpret):
        quant = _quantize_params(params, lq, band)
    fn = _gathered_fn(mesh, band, tile, interpret, use_pallas, quant)
    try:
        out = fn(
            reads_host, concat_dev, read_id_p, reversed_p, win_start_p, lane_p,
            n_p, m_p, params_vec,
        )
    except Exception as e:
        if quant is None:
            raise
        _mark_int16_broken(e)
        fn = _gathered_fn(mesh, band, tile, interpret, use_pallas, None)
        out = fn(
            reads_host, concat_dev, read_id_p, reversed_p, win_start_p, lane_p,
            n_p, m_p, params_vec,
        )
    if stacked:
        try:
            out.copy_to_host_async()
        except AttributeError:
            pass
        return out
    return out[0, :b], out[1, :b]


def banded_scores(
    q_codes,
    w_codes,
    n,
    m,
    params,
    band: int = 128,
    tile: int = 256,
    use_pallas: bool | None = None,
    interpret: bool = False,
    chunk: int = DEFAULT_CHUNK,
    variant: str = "pen",
    return_diag_sums: bool = False,
):
    """Batched banded-DP scores.

    q_codes [B, LQ] uint8 (0-padded), w_codes [B, LW] uint8, n/m [B] actual
    lengths.  B is padded up to a multiple of `tile`.  Uses the Pallas kernel
    on TPU and the jnp path elsewhere unless overridden.

    All padding/layout happens host-side in numpy and the codes cross the wire
    as uint8: on a tunneled TPU every eager device op costs a round trip, so
    the device sees exactly one fused jitted program per call."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        q_dev = jnp.asarray(np.asarray(q_codes), jnp.int32)
        w_dev = _pad_window(q_dev, jnp.asarray(np.asarray(w_codes), jnp.int32), band)
        n_dev = jnp.asarray(np.asarray(n), jnp.int32).reshape(-1, 1)
        m_dev = jnp.asarray(np.asarray(m), jnp.int32).reshape(-1, 1)
        return _banded_scores_jnp(q_dev, w_dev, n_dev, m_dev, _params_tuple(params), band)

    q_np = np.asarray(q_codes, dtype=np.uint8)
    w_np = np.asarray(w_codes, dtype=np.uint8)
    b, lq = q_np.shape
    import os as _os

    # packed-pair mode: two band-64 candidates per 128-lane kernel row
    # (effective band 64 at band-128 wall time; see _pen_kernel_x_i16_packed)
    # opt-in: measured on the real chip the packed kernel's per-step costs
    # (lane-mapped n/m masks, half-boundary barriers, two masked capture
    # reduces) outweigh the halved row count — 4.68 ms/iter vs the plain
    # band-64 int16 kernel's 3.10 (BENCH.md "Packed-pair kernel") — so the
    # plain kernel stays the default; the packed path remains available and
    # bit-identical for future toolchains where select/reduce lower better
    pack64 = (
        variant == "pen"
        and band == 64
        and not _int16_disabled(interpret)
        and _os.environ.get("MAPPER_TPU_PACK64") == "1"
    )
    # pad query length to a chunk multiple and the window to lq + band so the
    # kernels' static slices never clamp
    lq_padded = -(-lq // chunk) * chunk
    row_quantum = 2 * tile if pack64 else tile
    padded_b = -(-b // row_quantum) * row_quantum
    q_host = np.zeros((padded_b, lq_padded), dtype=np.uint8)
    q_host[:b, :lq] = q_np
    w_host = np.zeros((padded_b, lq_padded + band), dtype=np.uint8)
    w_host[:b, : min(w_np.shape[1], lq_padded + band)] = w_np[
        :, : lq_padded + band
    ]
    n_host = np.ones((padded_b, 1), dtype=np.int32)
    n_host[:b, 0] = np.asarray(n).reshape(-1)
    m_host = np.ones((padded_b, 1), dtype=np.int32)
    m_host[:b, 0] = np.asarray(m).reshape(-1)
    q_codes, w_codes, n, m = q_host, w_host, n_host, m_host

    params_vec = np.array(
        [[float(v) for v in _params_tuple(params)]], dtype=np.float32
    )
    if variant == "pen":
        quant = None if _int16_disabled(interpret) else _quantize_params(params, lq_padded, band)
        if quant is not None:
            try:
                if pack64:
                    hb = padded_b // 2
                    sA, sB, dA, dB = _banded_scores_pallas_pen_i16_packed(
                        q_codes[:hb], w_codes[:hb], n[:hb], m[:hb],
                        q_codes[hb:], w_codes[hb:], n[hb:], m[hb:],
                        tile, interpret, quant,
                    )
                    scores = jnp.concatenate([sA, sB])
                    diag_sums = jnp.concatenate([dA, dB])
                else:
                    scores, diag_sums = _banded_scores_pallas_pen_i16(
                        q_codes, w_codes, n, m, band, tile, interpret, quant
                    )
            except Exception as e:
                _mark_int16_broken(e)
                quant = None
        if quant is None:
            scores, diag_sums = _banded_scores_pallas_pen(
                q_codes, w_codes, n, m, params_vec, band, tile, interpret
            )
        if return_diag_sums:
            return scores[:b], diag_sums[:b]
        return scores[:b]
    if variant == "roll":
        scores = _banded_scores_pallas_roll(
            q_codes, w_codes, n, m, params_vec, band, tile, interpret
        )
        return scores[:b]

    num_chunks = lq_padded // chunk
    w_np = np.asarray(w_codes)
    windows = np.lib.stride_tricks.sliding_window_view(w_np, chunk + band, axis=1)
    # layout [num_chunks, B, chunk+band]: the chunk axis leads so the block's
    # trailing two dims satisfy the TPU (8, 128) block-shape rules
    w_chunks = np.ascontiguousarray(
        windows[:, ::chunk][:, :num_chunks].transpose(1, 0, 2)
    )
    scores = _banded_scores_pallas(
        q_codes, jnp.asarray(w_chunks), n, m, params_vec, band, tile, interpret, chunk
    )
    return scores[:b]
