"""Device banded-DP scoring tests: the jnp path must agree with the exact host
DP on in-band alignments, and the Pallas kernel (interpret mode on CPU) must
agree with the jnp path."""

import numpy as np
import pytest

from mapper_tpu import basepairs
from mapper_tpu.align import pallas_dp
from mapper_tpu.align.dp import _forward_dp
from mapper_tpu.align.params import AlignmentParameters


def make_params():
    return AlignmentParameters.defaults(max_error_rate=1.0)


def random_pair(rng, n, shift, num_snps=0, indel=0):
    ref = rng.integers(0, 4, size=n + 2 * shift)
    ref_codes = np.array([1, 2, 4, 8], dtype=np.uint8)[ref]
    q = list(ref_codes[shift : shift + n])
    for _ in range(num_snps):
        pos = int(rng.integers(0, len(q)))
        q[pos] = int(np.array([1, 2, 4, 8])[rng.integers(0, 4)])
    if indel > 0:
        pos = int(rng.integers(5, len(q) - 5))
        if rng.random() < 0.5:
            for _ in range(indel):
                q.insert(pos, int(np.array([1, 2, 4, 8])[rng.integers(0, 4)]))
            q = q[:n]
        else:
            del q[pos : pos + indel]
    return np.array(q, dtype=np.uint8), ref_codes


def host_exact_score(q, w, params):
    best, _, _ = _forward_dp(q, w, params, may_extend=False, max_ins_ext=0.0)
    return float(best[q.shape[0]].min())


@pytest.mark.parametrize("seed", range(6))
def test_jnp_scores_match_host_dp(seed):
    rng = np.random.default_rng(seed)
    params = make_params()
    batch_q, batch_w, ns, ms, expected = [], [], [], [], []
    lq, shift = 48, 8
    band = 32
    for case in range(8):
        n = int(rng.integers(20, lq))
        q, w = random_pair(rng, n, shift, num_snps=int(rng.integers(0, 3)), indel=int(rng.integers(0, 2)))
        n = q.shape[0]
        m = w.shape[0]
        expected.append(host_exact_score(q, w, params))
        batch_q.append(np.pad(q, (0, lq - n)))
        batch_w.append(np.pad(w, (0, lq + band - m)))
        ns.append(n)
        ms.append(m)
    scores = np.asarray(
        pallas_dp.banded_scores_reference(
            np.stack(batch_q), np.stack(batch_w), np.array(ns), np.array(ms), params, band
        )
    )
    for i in range(8):
        assert scores[i] == pytest.approx(expected[i], abs=1e-4), f"case {i}"


def test_pallas_interpret_matches_jnp():
    rng = np.random.default_rng(42)
    params = make_params()
    lq, shift, band, tile = 32, 4, 16, 4
    batch_q, batch_w, ns, ms = [], [], [], []
    for _ in range(8):
        n = int(rng.integers(16, lq))
        q, w = random_pair(rng, n, shift, num_snps=1, indel=1)
        batch_q.append(np.pad(q, (0, lq - q.shape[0])))
        batch_w.append(np.pad(w, (0, lq + band - w.shape[0])))
        ns.append(q.shape[0])
        ms.append(w.shape[0])
    q_arr, w_arr = np.stack(batch_q), np.stack(batch_w)
    n_arr, m_arr = np.array(ns), np.array(ms)
    jnp_scores = np.asarray(
        pallas_dp.banded_scores_reference(q_arr, w_arr, n_arr, m_arr, params, band)
    )
    pallas_scores = np.asarray(
        pallas_dp.banded_scores(
            q_arr, w_arr, n_arr, m_arr, params, band=band, tile=tile,
            use_pallas=True, interpret=True, chunk=16,
        )
    )
    np.testing.assert_allclose(pallas_scores, jnp_scores, atol=1e-5)


def test_perfect_match_scores_zero():
    params = make_params()
    rng = np.random.default_rng(7)
    q, w = random_pair(rng, 40, 8)
    scores = np.asarray(
        pallas_dp.banded_scores_reference(
            q[None, :], w[None, :], np.array([40]), np.array([w.shape[0]]), params, 32
        )
    )
    assert scores[0] == pytest.approx(0.0, abs=1e-6)


def test_snp_scores_mutation_penalty():
    params = make_params()
    rng = np.random.default_rng(8)
    q, w = random_pair(rng, 40, 8, num_snps=1)
    scores = np.asarray(
        pallas_dp.banded_scores_reference(
            q[None, :], w[None, :], np.array([40]), np.array([w.shape[0]]), params, 32
        )
    )
    # one SNP -> penalty 1.0 (unless the random SNP hit the same base)
    assert scores[0] in (pytest.approx(0.0), pytest.approx(1.0))


def test_gathered_scoring_matches_host_windows():
    """banded_scores_gathered (device-resident reference, on-device RC +
    window gather + lane pick) must equal the host-window pen path."""
    import jax

    rng = np.random.default_rng(11)
    params = AlignmentParameters.defaults()
    band, lq, shift = 32, 64, 12
    concat = np.array([1, 2, 4, 8], dtype=np.uint8)[rng.integers(0, 4, size=4000)]
    num_reads, num_cands = 24, 40
    reads = np.zeros((num_reads, lq), dtype=np.uint8)
    n_read = rng.integers(lq // 2, lq + 1, size=num_reads)
    for r in range(num_reads):
        start = int(rng.integers(0, concat.shape[0] - lq))
        reads[r, : n_read[r]] = concat[start : start + int(n_read[r])]
    read_id = rng.integers(0, num_reads, size=num_cands).astype(np.int32)
    reversed_ = rng.random(num_cands) < 0.5
    n = n_read[read_id].astype(np.int64)
    win_start = rng.integers(0, concat.shape[0] - lq - band, size=num_cands).astype(np.int64)
    w_len = np.minimum(n + 2 * shift, concat.shape[0] - win_start).astype(np.int64)
    lane = rng.integers(0, band, size=num_cands).astype(np.int64)

    # host-window reference computation
    q_codes = np.zeros((num_cands, lq), dtype=np.uint8)
    for c in range(num_cands):
        codes = reads[read_id[c], : n[c]]
        if reversed_[c]:
            codes = basepairs.reverse_complement(codes)
        q_codes[c, : n[c]] = codes
    w_idx = win_start[:, None] + np.arange(lq + band, dtype=np.int64)[None, :]
    w_idx = np.minimum(w_idx, concat.shape[0] - 1)
    w_codes = concat[w_idx]
    banded_ref, diag_ref = pallas_dp.banded_scores(
        q_codes, w_codes, n, w_len, params, band=band, tile=8,
        use_pallas=True, interpret=True, return_diag_sums=True,
    )
    banded_ref = np.asarray(banded_ref)
    ung_ref = np.asarray(diag_ref)[np.arange(num_cands), np.clip(lane, 0, band - 1)]

    concat_dev = jax.device_put(concat)
    banded_got, ung_got = pallas_dp.banded_scores_gathered(
        reads, concat_dev, read_id, reversed_, win_start, lane, n, w_len,
        params, band=band, tile=8, interpret=True, read_bucket=8,
        use_pallas=True,
    )
    np.testing.assert_array_equal(np.asarray(banded_got), banded_ref)
    np.testing.assert_array_equal(np.asarray(ung_got), ung_ref)

    # the f32 jnp path (what CPU-backend runs use) must agree to rounding
    banded_f32, ung_f32 = pallas_dp.banded_scores_gathered(
        reads, concat_dev, read_id, reversed_, win_start, lane, n, w_len,
        params, band=band, tile=8, interpret=True, read_bucket=8,
        use_pallas=False,
    )
    np.testing.assert_allclose(np.asarray(banded_f32), banded_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ung_f32), ung_ref, atol=1e-4)


def test_quantize_params():
    """Fixed-point quantizer: defaults are 1/30-rational; irrational or
    oversized-budget parameter sets fall back to None (f32 kernel)."""
    p = AlignmentParameters.defaults()
    quant = pallas_dp._quantize_params(p, 192, 64)
    assert quant == (30, (30, 1, 63, 18, 60, 15))
    # budget too large for the saturation ceiling -> f32 fallback
    assert pallas_dp._quantize_params(p, 2048, 64) is None
    # not exactly representable at any scale <= 1024
    import math

    p_pi = AlignmentParameters.defaults(mutation_penalty=math.pi)
    assert pallas_dp._quantize_params(p_pi, 192, 64) is None


def test_int16_kernel_matches_f32(monkeypatch):
    """The int16 fixed-point pen kernel (interpret mode) must agree with the
    f32 kernel to rounding on SNP- and indel-bearing batches, and exactly
    reproduce integer-unit scores."""
    rng = np.random.default_rng(5)
    params = AlignmentParameters.defaults(max_error_rate=1.0)
    lq, shift, band, tile = 64, 8, 32, 8
    batch_q, batch_w, ns, ms = [], [], [], []
    for i in range(16):
        n = int(rng.integers(40, lq))
        q, w = random_pair(
            rng, n, shift, num_snps=int(rng.integers(0, 4)), indel=int(rng.integers(0, 3))
        )
        batch_q.append(np.pad(q, (0, lq - q.shape[0])))
        batch_w.append(np.pad(w, (0, lq + band - w.shape[0])))
        ns.append(q.shape[0])
        ms.append(w.shape[0])
    q_arr, w_arr = np.stack(batch_q), np.stack(batch_w)
    n_arr, m_arr = np.array(ns), np.array(ms)

    scores_i16, diag_i16 = pallas_dp.banded_scores(
        q_arr, w_arr, n_arr, m_arr, params, band=band, tile=tile,
        use_pallas=True, interpret=True, return_diag_sums=True,
    )
    monkeypatch.setenv("MAPPER_TPU_NO_INT16", "1")
    scores_f32, diag_f32 = pallas_dp.banded_scores(
        q_arr, w_arr, n_arr, m_arr, params, band=band, tile=tile,
        use_pallas=True, interpret=True, return_diag_sums=True,
    )
    s16, s32 = np.asarray(scores_i16), np.asarray(scores_f32)
    np.testing.assert_allclose(s16, s32, atol=1e-4)
    np.testing.assert_allclose(np.asarray(diag_i16), np.asarray(diag_f32), atol=1e-3)
    # int16 scores are exact integer counts of 1/scale
    scale = 6  # defaults at max_error_rate=1.0
    assert pallas_dp._quantize_params(params, lq, band)[0] == scale
    finite = s16 < 1e8
    assert finite.any()
    np.testing.assert_allclose(
        s16[finite] * scale, np.round(s16[finite] * scale), atol=1e-3
    )


def test_int16_saturation_reports_big():
    """Saturated rows (score beyond the int16 ceiling) must come back as BIG
    (treated as no-alignment), never a small wrapped value."""
    params = AlignmentParameters.defaults(max_error_rate=1.0)
    band, tile = 16, 8
    lq = 2048  # budget check fails -> quantizer refuses (saturation unsafe)
    assert pallas_dp._quantize_params(params, lq, band) is None
    # at a safe length, an all-mismatch read scores n * mutation exactly
    lq = 64
    q = np.full(lq, 1, dtype=np.uint8)  # all A
    w = np.full(lq + band, 2, dtype=np.uint8)  # all C
    scores = np.asarray(
        pallas_dp.banded_scores(
            q[None], w[None], np.array([lq]), np.array([lq + band]), params,
            band=band, tile=tile, use_pallas=True, interpret=True,
        )
    )
    assert scores[0] == 64.0


def test_packed_pair_kernel_matches_unpacked(monkeypatch):
    """The packed-pair kernel (two band-64 candidates per 128-lane row,
    MAPPER_TPU_PACK64) must be bit-identical to the unpacked band-64 int16
    kernel: the half-boundary barrier makes each half an independent band-64
    DP."""
    rng = np.random.default_rng(9)
    params = AlignmentParameters.defaults()
    lq, shift, band, tile = 192, 16, 64, 8
    batch_q, batch_w, ns, ms = [], [], [], []
    for i in range(32):
        n = int(rng.integers(100, lq))
        q, w = random_pair(
            rng, n, shift, num_snps=int(rng.integers(0, 6)), indel=int(rng.integers(0, 4))
        )
        batch_q.append(np.pad(q, (0, lq - q.shape[0])))
        batch_w.append(np.pad(w, (0, max(0, lq + band - w.shape[0]))))
        ns.append(q.shape[0])
        ms.append(min(w.shape[0], lq + band))
    q_arr = np.stack(batch_q)
    w_arr = np.stack([w[: lq + band] for w in batch_w])
    n_arr, m_arr = np.array(ns), np.array(ms)

    monkeypatch.setenv("MAPPER_TPU_PACK64", "1")
    s_packed, d_packed = pallas_dp.banded_scores(
        q_arr, w_arr, n_arr, m_arr, params, band=band, tile=tile,
        use_pallas=True, interpret=True, return_diag_sums=True,
    )
    monkeypatch.setenv("MAPPER_TPU_PACK64", "0")
    s_plain, d_plain = pallas_dp.banded_scores(
        q_arr, w_arr, n_arr, m_arr, params, band=band, tile=tile,
        use_pallas=True, interpret=True, return_diag_sums=True,
    )
    np.testing.assert_array_equal(np.asarray(s_packed), np.asarray(s_plain))
    np.testing.assert_array_equal(np.asarray(d_packed), np.asarray(d_plain))
