"""G18-G22: per-block scoring, labeling, rescue rule, confidence gate.

Replaces the reference CNN (model.py:17-51) with a deterministic
text-density + link-density heuristic (Readability/Boilerpipe-style block
classification, per BASELINE.json north_star), but keeps the decision
*structure* of predict.py:251-281 exactly:

  score vector -> argmax label -> noise-rescue (>= 0.15) -> accept gate
  (>= 0.70)

All blocks of a turn are scored at once as one NumPy matrix op — never a
Python loop per block (replacing the reference's batch-of-1 model.predict
anti-pattern, predict.py:242-251; SURVEY.md §4.1).
"""

from __future__ import annotations

import numpy as np

from ocr_spark.constants import (
    CONFIDENCE_THRESHOLD,
    LINK_DENSITY_MAX,
    RESCUE_THRESHOLD,
    W_DENSITY,
    W_LINK,
)
from ocr_spark.extract.threshold import otsu_threshold


def content_scores(
    q: np.ndarray, link_density: np.ndarray, otsu_t: int | None = None
) -> np.ndarray:
    """G15+G18+G19: content score per block, float64 in [0,1].

    d_score: 1.0 above the Otsu split, else a sub-0.5 fraction of how
    close the block sits to the split (feature scaling to [0,1], G18).
    link penalty: linear up to LINK_DENSITY_MAX then saturated.
    """
    if len(q) == 0:
        return np.zeros(0, dtype=np.float64)
    if otsu_t is None:
        otsu_t = otsu_threshold(q)
    qf = q.astype(np.float64)
    if otsu_t < 0:
        # no usable split (unimodal/degenerate histogram): everything is
        # foreground — EXCEPT zero-density blocks (no alphanumeric signal
        # at all), which can never be content
        d_score = np.where(q > 0, 1.0, 0.0)
    else:
        d_score = np.where(q > otsu_t, 1.0, 0.5 * qf / (otsu_t + 1.0))
    link_pen = np.minimum(link_density / LINK_DENSITY_MAX, 1.0)
    score = W_DENSITY * d_score + W_LINK * (1.0 - link_pen)
    return np.clip(score, 0.0, 1.0)


def content_scores_batch(
    q: np.ndarray, link_density: np.ndarray, otsu_t: np.ndarray
) -> np.ndarray:
    """Elementwise twin of content_scores with a PER-BLOCK otsu threshold
    array (each block carries its turn's split) — bit-identical ops, so
    flat cross-turn batching gives the same floats as per-turn calls."""
    if len(q) == 0:
        return np.zeros(0, dtype=np.float64)
    qf = q.astype(np.float64)
    tf = otsu_t.astype(np.float64)
    safe_denom = np.where(otsu_t < 0, 1.0, tf + 1.0)
    d_score = np.where(
        otsu_t < 0,
        np.where(q > 0, 1.0, 0.0),
        np.where(q > otsu_t, 1.0, 0.5 * qf / safe_denom),
    )
    link_pen = np.minimum(link_density / LINK_DENSITY_MAX, 1.0)
    score = W_DENSITY * d_score + W_LINK * (1.0 - link_pen)
    return np.clip(score, 0.0, 1.0)


def accept(scores: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """G20/G21/G22: label -> rescue -> gate.  Returns (accepted, prob).

    label        = content iff content_score >= 0.5 (2-class argmax, G20)
    rescue (G21) = noise-labeled block kept in the pipeline iff
                   content_score >= RESCUE_THRESHOLD (else hard-dropped),
                   with prob = content_score — mirroring predict.py:259-269
                   where the second-best class replaces the noise label.
    gate (G22)   = accepted iff prob >= CONFIDENCE_THRESHOLD
                   (predict.py:275; applied after rescue, so rescued
                   blocks — prob < 0.5 — never pass, exactly as in the
                   reference where second-best prob <= 0.5 < 0.70).
    """
    prob = scores.astype(np.float64)
    is_content = prob >= 0.5
    rescued = (~is_content) & (prob >= RESCUE_THRESHOLD)
    in_play = is_content | rescued
    accepted = in_play & (prob >= CONFIDENCE_THRESHOLD)
    return accepted, prob
