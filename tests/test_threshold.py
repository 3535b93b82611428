"""G3/G4/G5/G15 threshold-stage unit tests, incl. Otsu on a known bimodal
histogram (FIXTURES.md §3) and comparator/boundary pinning."""

import numpy as np

from ocr_spark.extract.threshold import (
    adaptive_candidates,
    close_gaps,
    moving_average,
    otsu_split,
    otsu_threshold,
    quantize,
)


def test_quantize_bounds():
    q = quantize(np.array([0.0, 0.5, 1.0, 1.5, -0.1]))
    assert q.tolist() == [0, 127, 255, 255, 0]


def test_moving_average_short_series():
    # window longer than the series must not blow up (clamped)
    out = moving_average(np.array([10.0, 20.0]), 21)
    assert len(out) == 2


def test_otsu_bimodal():
    # two clear modes at 20 and 220 -> threshold strictly between
    q = np.array([20] * 10 + [220] * 10)
    t = otsu_threshold(q)
    assert 20 <= t < 220
    # cv2 convention: foreground = q > t separates the modes exactly
    assert (q > t).sum() == 10


def test_otsu_tie_breaks_low():
    # symmetric two-point histogram: every split between the modes has
    # equal variance only at distinct t; argmax picks the lowest bin
    q = np.array([10, 10, 200, 200])
    t = otsu_threshold(q)
    assert t == 10  # the first bin achieving max between-class variance


def test_otsu_degenerate():
    assert otsu_threshold(np.array([], dtype=np.int64)) == -1
    assert otsu_threshold(np.array([7, 7, 7])) == 6  # single bin -> bin-1
    assert otsu_split(np.array([7, 7, 7])) == -1


def test_otsu_split_bimodality_guard():
    # well separated -> split honored
    q = np.array([20] * 10 + [220] * 10)
    assert otsu_split(q) >= 20
    # near-unimodal (means closer than OTSU_MIN_SEPARATION) -> -1
    q2 = np.array([200, 205, 210, 215, 220])
    assert otsu_split(q2) == -1


def test_adaptive_uniform_all_candidates():
    q = np.full(30, 128)
    assert adaptive_candidates(q).all()


def test_adaptive_rejects_local_dip():
    # one deep dip below the local mean - C is not a candidate
    q = np.full(30, 200)
    q[15] = 0
    cand = adaptive_candidates(q)
    assert not cand[15]
    # SMOOTH_WINDOW=3 spreads the dip to immediate neighbors (blur
    # semantics); blocks beyond the kernel stay candidates
    assert cand[[0, 5, 13, 17, 29]].all()


def test_close_gaps_single_gap():
    cand = np.array([True, False, True])
    assert close_gaps(cand).tolist() == [True, True, True]


def test_close_gaps_long_gap_not_closed():
    cand = np.array([True, False, False, True])
    assert close_gaps(cand, gap_max=1).tolist() == [True, False, False, True]


def test_close_gaps_edges_not_closed():
    # a gap touching either edge is not sandwiched -> stays open
    cand = np.array([False, True, True, False])
    assert close_gaps(cand).tolist() == [False, True, True, False]


def test_moving_average_vs_convolve_differential():
    """The pinned manual accumulation is the DEFINITION of the smoothing
    semantics; this differential bounds its drift against the np.convolve
    formulation it replaced (ulp-level only) and proves no adaptive-
    threshold DECISION ever flips on quantized-integer inputs — the only
    place drift could change output bytes (strict > in
    adaptive_candidates).  Accepted-drift note: BASELINE.md."""
    from ocr_spark.constants import ADAPTIVE_C, ADAPTIVE_WINDOW, SMOOTH_WINDOW

    def conv_same(x, window):
        w = min(window, len(x))
        k = np.ones(w, dtype=np.float64) / w
        return np.convolve(x.astype(np.float64), k, mode="same")

    rng = np.random.default_rng(17)
    flips = 0
    max_drift = 0.0
    for _ in range(500):
        n = int(rng.integers(1, 300))
        # bias toward repeated values: exact-tie-prone series
        vals = rng.integers(0, 8, size=n) * 32
        q = vals.astype(np.float64)
        for w in (SMOOTH_WINDOW, ADAPTIVE_WINDOW):
            drift = np.abs(moving_average(q, w) - conv_same(q, w))
            max_drift = max(max_drift, float(drift.max()) if len(drift) else 0.0)
        s_a = moving_average(q, SMOOTH_WINDOW)
        m_a = moving_average(s_a, ADAPTIVE_WINDOW)
        s_b = conv_same(q, SMOOTH_WINDOW)
        m_b = conv_same(s_b, ADAPTIVE_WINDOW)
        if not np.array_equal(s_a > m_a - ADAPTIVE_C, s_b > m_b - ADAPTIVE_C):
            flips += 1
    assert max_drift < 1e-9, max_drift
    assert flips == 0
