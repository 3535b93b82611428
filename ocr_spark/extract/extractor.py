"""The per-turn extraction pipeline (G1-G26) and its batch driver.

`extract_turn` is a pure function of one payload — the generalization of
`predict_from_pil_image` (/root/reference/handwriting/predict.py:212-299).
`extract_frame` runs it over a pandas batch; the single-process oracle and
the distributed mapInPandas operator both call `extract_frame`, so
"per-turn text equality under stable turn ordering" holds by construction.

Stage order (mirrors the reference lifecycle, SURVEY.md §3.1):
  canonicalize (G1/G17) -> segment (G6/G11) -> densities (G18) ->
  adaptive threshold (G3/G4) -> gap close (G5) -> geometric gates
  (G7-G10) -> whole-turn fallback (G14) -> Otsu scoring (G15/G19) ->
  label/rescue/gate (G20-G22) -> pad (G13) -> merge (G12) ->
  ordered emit (G23-G25); per-turn failure isolation (G26).
"""

from __future__ import annotations

import re
import warnings
from typing import Any

import numpy as np
import pandas as pd

from ocr_spark.constants import (
    FOOTER_FRAC,
    FOOTER_MAX_WORDS,
    LINK_DENSITY_MAX,
    MIN_BLOCK_CHARS,
    MIN_WORDS,
)
from ocr_spark.extract.canon import canonicalize, strip_tags
from ocr_spark.extract.classify import accept, content_scores
from ocr_spark.extract.merge import merge_spans, pad_span
from ocr_spark.extract.segment import Block, segment
from ocr_spark.extract.threshold import (
    adaptive_candidates,
    close_gaps,
    otsu_split,
    quantize,
)

# Per-process compiled state (G27: the model-singleton pattern,
# predict.py:7,16-29 — read-only, loaded once per executor worker).
_RE_ANCHOR = re.compile(r"<a\b[^>]*>(.*?)</a>", re.IGNORECASE | re.DOTALL)
_RE_NONSPACE = re.compile(r"\S")
_RE_ALNUM = re.compile(r"[0-9A-Za-z]")
# Run-collapsed complements for COUNTING: len(x) after removing \s runs ==
# number of \S chars (exact complement, same regex unicode semantics), one
# sub call instead of a findall materializing a list of 1-char matches.
_RE_WS_RUNS = re.compile(r"\s+")
_RE_NON_ALNUM_RUNS = re.compile(r"[^0-9A-Za-z]+")


# Observability for the batched-kernel degrade path (G26 preserves
# correctness, but a SYSTEMATIC batched-path bug would silently cost the
# ~2.7x batching speedup everywhere): count every whole-batch fallback
# and warn once.  Scope: the counter is per PROCESS — on the driver /
# single-process oracle it is directly assertable (tests/
# test_batch_parity.py pins it at zero over the fixture corpus); in a
# distributed run each Python UDF worker warns once to its own stderr,
# which Spark surfaces in executor logs.
BATCH_FALLBACKS = 0


def note_batch_fallback(exc: BaseException) -> None:
    global BATCH_FALLBACKS
    BATCH_FALLBACKS += 1
    if BATCH_FALLBACKS == 1:
        try:
            warnings.warn(
                "batched extraction kernel failed for a whole batch "
                f"({type(exc).__name__}: {exc}); degrading to the scalar "
                "per-turn loop — correct but ~2.7x slower",
                RuntimeWarning,
                stacklevel=3,
            )
        except Exception:
            # under PYTHONWARNINGS=error the warn itself raises; the
            # fallback path must still run (G26), so never propagate
            pass


def _count_nonspace(s: str) -> int:
    return len(_RE_WS_RUNS.sub("", s))


def _count_alnum(s: str) -> int:
    return len(_RE_NON_ALNUM_RUNS.sub("", s))

# Output schema shared by oracle, batch job, and streaming sink.
OUTPUT_SCHEMA_DDL = (
    "conv_id string, turn_idx int, extracted_text string, "
    "spans array<struct<start:int,end:int,score:float,position:int>>, "
    "n_blocks_in int, n_blocks_kept int, status string"
)

STATUS_OK = "ok"
STATUS_EMPTY = "empty"
STATUS_ERROR = "error"


def _block_features(canon: str, blocks: list[Block]) -> dict[str, np.ndarray]:
    """Vectorized-across-blocks feature extraction (G18).

    density      = alnum chars / raw block length (the 'ink' fraction)
    link_density = anchor inner-text chars / visible non-space chars (G9)
    words        = whitespace-token count of visible text (G10)
    pos_frac     = block start / payload length (G8)
    """
    n = len(blocks)
    density = np.zeros(n, dtype=np.float64)
    link_density = np.zeros(n, dtype=np.float64)
    words = np.zeros(n, dtype=np.int64)
    vis_chars = np.zeros(n, dtype=np.int64)
    pos_frac = np.zeros(n, dtype=np.float64)
    total = max(len(canon), 1)
    for i, b in enumerate(blocks):
        raw = canon[b.start : b.end]
        vis = strip_tags(raw)
        nvis = _count_nonspace(vis)
        alnum = _count_alnum(vis)
        link_chars = sum(
            _count_nonspace(strip_tags(m.group(1)))
            for m in _RE_ANCHOR.finditer(raw)
        )
        vis_chars[i] = nvis
        density[i] = alnum / max(len(raw), 1)
        link_density[i] = link_chars / max(nvis, 1)
        words[i] = len(vis.split())
        pos_frac[i] = b.start / total
    return {
        "density": density,
        "link_density": link_density,
        "words": words,
        "vis_chars": vis_chars,
        "pos_frac": pos_frac,
    }


def extract_turn(text: Any) -> dict[str, Any]:
    """Extract main content from one turn payload.  Pure; never raises.

    Returns dict(extracted_text, spans, n_blocks_in, n_blocks_kept,
    status).  spans = list of {start, end, score, position} with 1-indexed
    positions (G23) over the canonical text; extracted_text is the
    ordered '\n'-join of span slices (G24).
    """
    if text is None or not isinstance(text, str):
        return _envelope("", [], 0, STATUS_ERROR)
    try:
        return _extract_turn_inner(text)
    except Exception:
        # G26: per-turn failure isolation (predict.py:298-299).
        return _envelope("", [], 0, STATUS_ERROR)


def _extract_turn_inner(text: str) -> dict[str, Any]:
    canon, _truncated = canonicalize(text)
    if not canon.strip():
        return _envelope("", [], 0, STATUS_EMPTY)

    blocks = segment(canon)
    n_in = len(blocks)
    feats = _block_features(canon, blocks)
    q_all = quantize(feats["density"])

    # G3/G4/G5: adaptive candidate mask + gap closing over the series.
    cand = close_gaps(adaptive_candidates(q_all))

    # G7-G10 geometric gates (cheap-first ordering kept from the
    # reference, predict.py:70-87 — Catalyst can't reorder inside a UDF).
    keep = (
        cand
        & (feats["vis_chars"] >= MIN_BLOCK_CHARS)
        & ~((feats["pos_frac"] > FOOTER_FRAC) & (feats["words"] < FOOTER_MAX_WORDS))
        & (feats["link_density"] <= LINK_DENSITY_MAX)
        & (feats["words"] >= MIN_WORDS)
    )

    surv_idx = np.nonzero(keep)[0]
    if len(surv_idx) == 0:
        # G14: whole-turn fallback — segmentation never returns "nothing".
        lo, hi = 0, len(canon)
        while lo < hi and canon[lo].isspace():
            lo += 1
        while hi > lo and canon[hi - 1].isspace():
            hi -= 1
        blocks = [Block(lo, hi, 0, len(canon))]
        feats = _block_features(canon, blocks)
        q_all = quantize(feats["density"])
        surv_idx = np.array([0])

    # G15/G19-G22: score all surviving blocks as one matrix op (the Otsu
    # histogram is computed over ALL blocks of the turn for stability).
    otsu_t = otsu_split(q_all)
    scores = content_scores(
        q_all[surv_idx], feats["link_density"][surv_idx], otsu_t=otsu_t
    )
    accepted, prob = accept(scores)

    # G13 pad within raw bounds, then G12 whitespace-gap merge.
    padded: list[tuple[int, int, float]] = []
    for k in np.nonzero(accepted)[0]:
        b = blocks[int(surv_idx[k])]
        lo, hi = pad_span(canon, b.start, b.end, b.raw_start, b.raw_end)
        if lo < hi:
            padded.append((lo, hi, float(prob[k])))
    merged = merge_spans(canon, padded)

    # G23/G24/G25: ordered emit.
    spans = [
        {
            "start": int(s),
            "end": int(e),
            "score": float(np.float32(p)),
            "position": i + 1,
        }
        for i, (s, e, p) in enumerate(merged)
    ]
    extracted = "\n".join(canon[s:e] for s, e, _ in merged)
    status = STATUS_OK if spans else STATUS_EMPTY
    return _envelope(extracted, spans, n_in, status)


def _envelope(
    extracted: str, spans: list, n_in: int, status: str
) -> dict[str, Any]:
    return {
        "extracted_text": extracted,
        "spans": spans,
        "n_blocks_in": n_in,
        "n_blocks_kept": len(spans),
        "status": status,
    }


def _extract_batch_results(texts: list) -> list[dict[str, Any]]:
    """Cross-turn batched pipeline: per-turn regex stages stay rowwise,
    the numeric stages (quantize, adaptive threshold, Otsu, scoring,
    gating) run ONCE over the flat block arrays of the whole batch.
    Result-identical to [extract_turn(t) for t in texts] — guaranteed by
    shared elementwise ops + batch twins proven bit-identical to the
    scalar path (tests/test_batch_parity.py); each row's result depends
    only on its own blocks (row-purity: no batch-size effects).
    """
    from ocr_spark.extract.classify import content_scores_batch
    from ocr_spark.extract.threshold import (
        adaptive_candidates_batch,
        otsu_split_batch,
    )

    n = len(texts)
    results: list = [None] * n
    canons: list = [None] * n
    blocks_l: list = [None] * n

    # --- stage A (rowwise): canonicalize -> segment -> block features ----
    dens_parts, link_parts, words_parts, vis_parts, pos_parts = [], [], [], [], []
    lengths = np.zeros(n, dtype=np.int64)
    for i, text in enumerate(texts):
        if text is None or not isinstance(text, str):
            results[i] = _envelope("", [], 0, STATUS_ERROR)
            continue
        try:
            canon, _trunc = canonicalize(text)
            if not canon.strip():
                results[i] = _envelope("", [], 0, STATUS_EMPTY)
                continue
            blocks = segment(canon)
            feats = _block_features(canon, blocks)
        except Exception:
            results[i] = _envelope("", [], 0, STATUS_ERROR)
            continue
        canons[i] = canon
        blocks_l[i] = blocks
        lengths[i] = len(blocks)
        dens_parts.append(feats["density"])
        link_parts.append(feats["link_density"])
        words_parts.append(feats["words"])
        vis_parts.append(feats["vis_chars"])
        pos_parts.append(feats["pos_frac"])

    active = [i for i in range(n) if results[i] is None]
    if not active:
        return results

    # --- stage B (batched over all blocks of all active turns) -----------
    active_lengths = lengths[active]
    starts = np.zeros(len(active), dtype=np.int64)
    np.cumsum(active_lengths[:-1], out=starts[1:])
    turn_ids = np.repeat(np.arange(len(active)), active_lengths)
    density = np.concatenate(dens_parts) if dens_parts else np.zeros(0)
    link = np.concatenate(link_parts) if link_parts else np.zeros(0)
    words = np.concatenate(words_parts) if words_parts else np.zeros(0, dtype=np.int64)
    vis = np.concatenate(vis_parts) if vis_parts else np.zeros(0, dtype=np.int64)
    pos = np.concatenate(pos_parts) if pos_parts else np.zeros(0)

    q_all = quantize(density)
    cand = adaptive_candidates_batch(q_all, starts, active_lengths)
    # G5 gap closing is a per-turn sequential scan over a tiny bool run
    for a, (s, ln) in enumerate(zip(starts, active_lengths)):
        if ln:
            cand[s : s + ln] = close_gaps(cand[s : s + ln])
    keep = (
        cand
        & (vis >= MIN_BLOCK_CHARS)
        & ~((pos > FOOTER_FRAC) & (words < FOOTER_MAX_WORDS))
        & (link <= LINK_DENSITY_MAX)
        & (words >= MIN_WORDS)
    )
    otsu_t = otsu_split_batch(q_all, turn_ids, starts, active_lengths, len(active))
    surv_flat = np.nonzero(keep)[0]
    scores = content_scores_batch(
        q_all[surv_flat], link[surv_flat], otsu_t[turn_ids[surv_flat]]
    )
    accepted, prob = accept(scores)
    surv_turn = turn_ids[surv_flat]

    # --- stage C (rowwise): fallback / pad / merge / emit ----------------
    surv_bounds = np.searchsorted(surv_turn, np.arange(len(active) + 1))
    for a, i in enumerate(active):
        try:
            lo_k, hi_k = surv_bounds[a], surv_bounds[a + 1]
            if lo_k == hi_k:
                # G14 whole-turn fallback: rare path, re-run the scalar
                # pipeline (pure function -> identical result)
                results[i] = _extract_turn_inner(texts[i])
                continue
            canon = canons[i]
            blocks = blocks_l[i]
            base = starts[a]
            padded: list[tuple[int, int, float]] = []
            for k in range(lo_k, hi_k):
                if not accepted[k]:
                    continue
                b = blocks[int(surv_flat[k] - base)]
                plo, phi = pad_span(canon, b.start, b.end, b.raw_start, b.raw_end)
                if plo < phi:
                    padded.append((plo, phi, float(prob[k])))
            merged = merge_spans(canon, padded)
            spans = [
                {
                    "start": int(s),
                    "end": int(e),
                    "score": float(np.float32(p)),
                    "position": idx + 1,
                }
                for idx, (s, e, p) in enumerate(merged)
            ]
            extracted = "\n".join(canon[s:e] for s, e, _ in merged)
            status = STATUS_OK if spans else STATUS_EMPTY
            results[i] = _envelope(extracted, spans, len(blocks), status)
        except Exception:
            results[i] = _envelope("", [], 0, STATUS_ERROR)
    return results


def extract_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """Run the pipeline over a batch of turns.

    Input columns: conv_id, turn_idx, text (extra columns ignored).
    Output columns: OUTPUT_SCHEMA_DDL.  This one function is both the
    single-process oracle and the body of the mapInPandas operator.
    The numeric stages are batched across turns (_extract_batch_results);
    if the batched path ever fails as a whole it degrades to the scalar
    per-turn loop, preserving G26 per-turn failure isolation.
    """
    texts = pdf["text"].tolist()
    try:
        results = _extract_batch_results(texts)
    except Exception as exc:
        note_batch_fallback(exc)
        results = [extract_turn(t) for t in texts]
    return pd.DataFrame(
        {
            "conv_id": pdf["conv_id"].astype(str).values,
            "turn_idx": pdf["turn_idx"].astype("int32").values,
            "extracted_text": [r["extracted_text"] for r in results],
            "spans": [r["spans"] for r in results],
            "n_blocks_in": np.array(
                [r["n_blocks_in"] for r in results], dtype="int32"
            ),
            "n_blocks_kept": np.array(
                [r["n_blocks_kept"] for r in results], dtype="int32"
            ),
            "status": [r["status"] for r in results],
        }
    )
