"""G3/G4/G5/G15: density smoothing, adaptive threshold, gap close, Otsu.

Vectorized NumPy re-implementations of the reference's cv2 calls:
  - Gaussian blur 3x3            (predict.py:52)     -> moving average
  - adaptiveThreshold(21, C=5)   (predict.py:55-58)  -> local-mean cutoff
  - morphological close 5x5      (predict.py:61-62)  -> gap closing
  - cv2.threshold(THRESH_OTSU)   (predict.py:181)    -> otsu_threshold()

All math is float64 with densities quantized to 256 integer bins first
(mirrors uint8 pixels) so argmax ties break identically on every executor
(SURVEY.md §7.4 float-determinism risk).
"""

from __future__ import annotations

import numpy as np

from ocr_spark.constants import (
    ADAPTIVE_C,
    ADAPTIVE_WINDOW,
    DENSITY_BINS,
    GAP_MAX,
    OTSU_MIN_SEPARATION,
    SMOOTH_WINDOW,
)


# module-level constant (G27 once-per-worker init): allocated once, not
# per turn — otsu runs per turn in the UDF hot loop
_BINS = np.arange(DENSITY_BINS, dtype=np.float64)


def quantize(densities: np.ndarray) -> np.ndarray:
    """Quantize densities in [0,1] to integer bins 0..255 (uint8 analogue)."""
    q = np.floor(densities * (DENSITY_BINS - 1)).astype(np.int64)
    return np.clip(q, 0, DENSITY_BINS - 1)


def moving_average(x: np.ndarray, window: int) -> np.ndarray:
    """Centered moving average, zero-padded edges (np.convolve 'same'
    semantics).  Delegates to the batched implementation so the scalar
    (oracle/test) path and the batched hot path are bit-identical by
    construction — ulp-level summation-order differences here would flip
    strict-> comparisons in adaptive_candidates on exact-tie inputs."""
    if len(x) == 0:
        return x.astype(np.float64)
    w = min(window, len(x))
    return moving_average_batch(
        x.astype(np.float64)[None, :], w, np.array([len(x)])
    )[0]


def adaptive_candidates(q: np.ndarray) -> np.ndarray:
    """G3+G4: smooth then locally threshold the block-density series.

    Block i is a content candidate iff
        smooth(q)[i] > local_mean(smooth(q), ADAPTIVE_WINDOW)[i] - ADAPTIVE_C
    (strict >, mirroring adaptiveThreshold's mean-minus-C cutoff).
    """
    if len(q) == 0:
        return np.zeros(0, dtype=bool)
    smooth = moving_average(q, SMOOTH_WINDOW)
    local_mean = moving_average(smooth, ADAPTIVE_WINDOW)
    return smooth > local_mean - ADAPTIVE_C


def close_gaps(cand: np.ndarray, gap_max: int = GAP_MAX) -> np.ndarray:
    """G5: flip runs of <= gap_max False sandwiched between True to True.

    The text analogue of the 5x5 morphological close: content blocks
    separated by a short boilerplate gap become one candidate run.
    """
    out = cand.copy()
    n = len(cand)
    i = 0
    while i < n:
        if not out[i]:
            j = i
            while j < n and not out[j]:
                j += 1
            # [i, j) is a False run; interior + short -> close it
            if 0 < i and j < n and (j - i) <= gap_max:
                out[i:j] = True
            i = j
        else:
            i += 1
    return out


def otsu_threshold(q: np.ndarray) -> int:
    """G15: Otsu's method on the 256-bin histogram of quantized densities.

    Returns the bin t maximizing between-class variance; foreground is
    q > t (cv2 THRESH_BINARY convention).  Ties break toward the lowest
    bin (np.argmax).  Degenerate single-bin input returns that bin - 1 so
    the whole mass counts as foreground.  Pure vectorized NumPy
    (north_star names this re-implementation explicitly).
    """
    if len(q) == 0:
        return -1
    hist = np.bincount(q, minlength=DENSITY_BINS).astype(np.float64)
    total = hist.sum()
    omega = np.cumsum(hist)          # weight of class0 = {x <= t}
    mu = np.cumsum(hist * _BINS)     # first moment of class0
    mu_total = mu[-1]
    valid = (omega > 0) & (omega < total)
    if not valid.any():
        return int(q[0]) - 1
    # clamp invalid denominators to 1 instead of an errstate context
    # (the context manager costs ~10us/call in this per-turn hot loop);
    # valid entries' floats are untouched, invalid ones are overwritten
    denom = omega * (total - omega)
    denom[~valid] = 1.0
    sigma_b = (mu_total * omega - total * mu) ** 2 / denom
    sigma_b[~valid] = -1.0
    return int(np.argmax(sigma_b))


def moving_average_batch(mat: np.ndarray, w: int, lengths: np.ndarray) -> np.ndarray:
    """Row-wise moving average over a zero-padded 2-D batch.

    np.convolve(x, ones(w)/w, 'same') SEMANTICS with a pinned
    accumulation order (products x*(1/w) added in ascending x index per
    output element) — the order is ours, documented, and frozen by exact
    golden bits in tests/test_batch_parity.py; the scalar moving_average
    delegates here so oracle and batched hot path share one float path.
    Columns beyond each row's length are zero so the extra terms add
    exact +0.0 (no cross-row leakage); `lengths` masks stale tail columns
    back to 0 so a second pass (the local-mean stage) never reads them.
    """
    n_rows, n_cols = mat.shape
    k = 1.0 / w
    off = (w - 1) // 2
    left = w - 1 - off
    pad = np.zeros((n_rows, n_cols + w - 1), dtype=np.float64)
    pad[:, left : left + n_cols] = mat
    acc = np.zeros((n_rows, n_cols), dtype=np.float64)
    # accumulate in convolve's internal order: ascending x index
    for j in range(w):
        acc += pad[:, j : j + n_cols] * k
    # zero the padding tail: positions >= row length are not part of the
    # row's series and must not leak into downstream windowed stages
    col = np.arange(n_cols)
    acc[col[None, :] >= lengths[:, None]] = 0.0
    return acc


def adaptive_candidates_batch(
    q_flat: np.ndarray, starts: np.ndarray, lengths: np.ndarray
) -> np.ndarray:
    """Batched adaptive_candidates over many turns' density series.

    q_flat holds all turns' quantized densities back-to-back;
    starts/lengths delimit each turn.  Turns are grouped by their
    effective window min(n, ADAPTIVE_WINDOW) — the kernel length must be
    constant within a 2-D batch — and each group is processed as one
    zero-padded matrix.  Output is the flat candidate mask, bit-identical
    to per-turn adaptive_candidates.
    """
    out = np.zeros(len(q_flat), dtype=bool)
    if len(q_flat) == 0:
        return out
    lengths = np.asarray(lengths)
    starts = np.asarray(starts)
    clamp = np.minimum(lengths, ADAPTIVE_WINDOW)
    for c in np.unique(clamp):
        if c == 0:
            continue
        rows = np.nonzero(clamp == c)[0]
        width = int(lengths[rows].max())
        mat = np.zeros((len(rows), width), dtype=np.float64)
        col = np.arange(width)
        row_len = lengths[rows]
        mask = col[None, :] < row_len[:, None]
        flat_idx = (starts[rows][:, None] + col[None, :])[mask]
        mat[mask] = q_flat[flat_idx]
        w1 = min(SMOOTH_WINDOW, int(c))
        smooth = moving_average_batch(mat, w1, row_len)
        local = moving_average_batch(smooth, int(c), row_len)
        cand = smooth > local - ADAPTIVE_C
        out[flat_idx] = cand[mask]
    return out


def otsu_split_batch(
    q_flat: np.ndarray, turn_ids: np.ndarray, starts: np.ndarray,
    lengths: np.ndarray, n_turns: int,
) -> np.ndarray:
    """Batched otsu_split in SPARSE form: O(total blocks) work instead of
    O(n_turns * 256) dense histograms (fresh multi-MB arrays page-fault
    heavily on this VM).  Value-identical to per-turn otsu_split:

    Between-class variance sigma(t) is a step function changing only at
    occupied bins, and each plateau starts AT an occupied bin, so the
    dense argmax (first index of the max) always lands on an occupied bin
    with omega < total.  Evaluating sigma only there — with the exact
    same integer-valued float64 operands and op order — reproduces the
    dense result bit-for-bit; ties break to the lowest bin via the sort
    key, matching np.argmax.
    """
    t_out = np.full(n_turns, -1, dtype=np.int64)
    if len(q_flat) == 0:
        return t_out
    starts = np.asarray(starts)
    lengths = np.asarray(lengths)
    # sort blocks by (turn, bin); turns stay contiguous
    order = np.lexsort((q_flat, turn_ids))
    qs = q_flat[order].astype(np.float64)
    ts = turn_ids[order]
    pos = np.arange(len(qs))
    t_start = starts[ts]
    omega = (pos - t_start + 1).astype(np.float64)   # count of values <= q at last occurrence
    csum0 = np.concatenate([[0.0], np.cumsum(qs)])   # exact ints in float64
    mu = csum0[pos + 1] - csum0[t_start]             # sum of values <= q
    total = lengths[ts].astype(np.float64)
    ends = starts + lengths
    mu_total_turn = csum0[ends] - csum0[starts]
    mu_total = mu_total_turn[ts]
    last = np.ones(len(qs), dtype=bool)
    last[:-1] = (ts[1:] != ts[:-1]) | (qs[1:] != qs[:-1])
    cand = last & (omega < total)
    if not cand.any():
        return t_out
    tc = ts[cand]
    qc = qs[cand]
    oc = omega[cand]
    mc = mu[cand]
    totc = total[cand]
    mtc = mu_total[cand]
    denom = oc * (totc - oc)
    sigma = (mtc * oc - totc * mc) ** 2 / denom
    # winner per turn: max sigma, ties -> lowest bin (np.argmax order)
    win_order = np.lexsort((qc, -sigma, tc))
    first = np.ones(len(win_order), dtype=bool)
    tw = tc[win_order]
    first[1:] = tw[1:] != tw[:-1]
    w = win_order[first]
    # bimodality guard: class-mean separation >= OTSU_MIN_SEPARATION
    lo_mean = mc[w] / oc[w]
    hi_mean = (mtc[w] - mc[w]) / (totc[w] - oc[w])
    sep_ok = hi_mean - lo_mean >= OTSU_MIN_SEPARATION
    t_out[tc[w][sep_ok]] = qc[w][sep_ok].astype(np.int64)
    return t_out


def otsu_split(q: np.ndarray) -> int:
    """Otsu threshold with a bimodality guard (G15).

    Returns -1 ("everything is foreground") when the histogram is
    degenerate or the two Otsu classes are closer than
    OTSU_MIN_SEPARATION bins — splitting a unimodal density histogram
    (e.g. an all-content plain-text turn) would reject real content.
    """
    t = otsu_threshold(q)
    if t < 0:
        return -1
    lo = q[q <= t]
    hi = q[q > t]
    if len(lo) == 0 or len(hi) == 0:
        return -1
    if hi.mean() - lo.mean() < OTSU_MIN_SEPARATION:
        return -1
    return t
