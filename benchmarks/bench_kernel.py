"""Trustworthy extend-kernel throughput measurement.

The remote TPU tunnel makes per-call timing fiction (BENCH.md: ~24 ms flat
fetch RTT, `block_until_ready` unreliable, 3x minute-to-minute device speed
swings).  This harness times N chained kernel iterations inside ONE jitted
program with ONE fetch: the chain feeds each iteration's input through a
data dependency on the previous result that the compiler cannot fold away
(float * 0 may be NaN), so XLA cannot hoist the loop body, and the per-
iteration cost is (total - RTT) / N.

Usage:  python benchmarks/bench_kernel.py [iters] [variant ...]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mapper_tpu.align import pallas_dp
from mapper_tpu.align.params import AlignmentParameters

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def make_batch(b, lq, band, shift, seed=3):
    rng = np.random.default_rng(seed)
    bases = np.array([1, 2, 4, 8], dtype=np.uint8)
    qs, ws, ns, ms = [], [], [], []
    for _ in range(b):
        n = int(rng.integers(lq - 40, lq))
        ref = bases[rng.integers(0, 4, size=n + 2 * shift)]
        q = np.array(ref[shift : shift + n])
        q[int(rng.integers(0, n))] = bases[rng.integers(0, 4)]
        qs.append(np.pad(q, (0, lq - n)))
        ws.append(np.pad(ref, (0, lq + band - len(ref))))
        ns.append(n)
        ms.append(len(ref))
    return (
        np.stack(qs),
        np.stack(ws),
        np.array(ns, dtype=np.int32).reshape(-1, 1),
        np.array(ms, dtype=np.int32).reshape(-1, 1),
    )


@functools.partial(
    jax.jit,
    static_argnames=("band", "tile", "iters", "variant", "xchunk", "quant_ints"),
)
def chained(q, w, n, m, params_vec, band, tile, iters, variant, xchunk=1, quant_ints=None):
    """iters chained kernel invocations; the input codes are perturbed by a
    provably-unfoldable zero derived from the previous scores."""
    q = q.astype(jnp.int32)
    w = w.astype(jnp.int32)

    def body(carry, _):
        acc, qq = carry
        if variant == "pen":
            scores, _diag = pallas_dp._pen_core(
                qq, w, n, m, params_vec, band, tile, False, xchunk=xchunk
            )
            # data dependency: scores[0] * 0 could be NaN, so XLA cannot fold
            # the perturbation to a constant and cannot hoist the loop body
            bump = (scores[0] * 0.0).astype(jnp.int32)
        elif variant == "i16":
            scores_i, _diag = pallas_dp._pen_core_i16(
                qq, w, n, m, quant_ints, band, tile, False, xchunk=xchunk
            )
            scores = scores_i.astype(jnp.float32)
            # data-dependent predicate: cannot be constant-folded
            bump = jnp.where(scores_i[0] > jnp.int16(30000), 1, 0)
        elif variant == "jnp":
            scores = pallas_dp._banded_scores_jnp(
                qq, w, n, m, tuple(params_vec[0, i] for i in range(6)), band
            )
            bump = (scores[0] * 0.0).astype(jnp.int32)
        else:
            raise ValueError(variant)
        return (acc + scores, qq + bump), None

    (acc, _), _ = jax.lax.scan(
        body, (jnp.zeros(q.shape[0], jnp.float32), q), None, length=iters
    )
    return acc


def run(variant, b, lq, band, tile, xchunk=1):
    q, w, n, m = make_batch(b, lq, band, shift=band // 2)
    params = AlignmentParameters.defaults(max_error_rate=1.0)
    quant = None
    if variant == "i16":
        quant = pallas_dp._quantize_params(params, lq, band)
        assert quant is not None, "defaults must quantize"
        params_vec = np.zeros((1, 6), dtype=np.float32)  # unused on the i16 path
    else:
        params_vec = np.array(
            [[float(v) for v in pallas_dp._params_tuple(params)]], dtype=np.float32
        )
    label = f"{variant} b={b} lq={lq} band={band} tile={tile} xchunk={xchunk}"
    t0 = time.time()
    out = np.asarray(chained(q, w, n, m, params_vec, band, tile, ITERS, variant, xchunk,
        quant_ints=None if quant is None else tuple(quant[1])))
    compile_s = time.time() - t0
    # single-iteration sanity vs the jnp oracle
    if variant != "jnp":
        fvec = np.array(
            [[float(v) for v in pallas_dp._params_tuple(params)]], dtype=np.float32
        )
        ref = np.asarray(
            pallas_dp._banded_scores_jnp(
                jnp.asarray(q, jnp.int32), jnp.asarray(w, jnp.int32), n, m,
                tuple(fvec[0, i] for i in range(6)), band,
            )
        )
        got = out / ITERS
        if variant == "i16":
            got = got / quant[0]
        mask = (ref < 1e8) & (got < pallas_dp.INF16 / max(1, quant[0] if variant == "i16" else 1))
        err = float(np.abs(ref[mask] - got[mask]).max()) if mask.any() else 0.0
        assert err < 1e-2, f"{label}: mismatch {err}"
    times = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(chained(q, w, n, m, params_vec, band, tile, ITERS, variant, xchunk,
            quant_ints=None if quant is None else tuple(quant[1])))
        times.append(time.time() - t0)
    best = min(times)
    rtt = 0.025  # flat fetch round trip (BENCH.md)
    per_iter = max(best - rtt, 1e-9) / ITERS
    cells = b * lq * band
    print(
        f"{label}: compile {compile_s:.1f}s, best-of-3 {best*1000:.1f} ms "
        f"({ITERS} iters) -> {per_iter*1000:.2f} ms/iter, "
        f"{cells/per_iter/1e9:.2f} Gcells/s",
        flush=True,
    )
    return cells / per_iter / 1e9


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    which = sys.argv[2:] or ["pen"]
    results = {}
    for variant in which:
        for b, lq, band, tile, xchunk in (
            (2048, 192, 64, 1024, 1),
            (2048, 192, 128, 1024, 1),
            (2048, 192, 64, 512, 4),
            (2048, 192, 128, 512, 4),
        ):
            try:
                key = (variant, b, lq, band, tile, xchunk)
                results[key] = run(variant, b, lq, band, tile, xchunk)
            except Exception as e:
                print(f"{variant} band={band} tile={tile} xchunk={xchunk} "
                      f"FAILED: {str(e)[:300]}", flush=True)
    best = max(results.items(), key=lambda kv: kv[1], default=None)
    if best:
        print("best:", best[0], f"{best[1]:.2f} Gcells/s", flush=True)
