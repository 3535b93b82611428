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
    """Centered moving average, zero-padded edges (np.convolve 'same')."""
    if len(x) == 0:
        return x.astype(np.float64)
    w = min(window, len(x))
    kernel = np.ones(w, dtype=np.float64) / w
    return np.convolve(x.astype(np.float64), kernel, mode="same")


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
