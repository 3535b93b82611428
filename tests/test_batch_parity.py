"""Differential parity: the cross-turn batched pipeline inside
extract_frame must be RESULT-IDENTICAL to the scalar per-turn path
(extract_turn), and the batched threshold twins must be bit-identical to
their scalar counterparts.  This is the guard that lets the hot path be
batched without risking the byte-exactness invariant."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from fixtures.gen import gen_transcripts
from ocr_spark.extract.extractor import extract_frame, extract_turn
from ocr_spark.extract.threshold import (
    adaptive_candidates,
    adaptive_candidates_batch,
    moving_average,
    moving_average_batch,
    otsu_split,
    otsu_split_batch,
)


def _assert_frame_matches_scalar(texts):
    pdf = pd.DataFrame(
        {"conv_id": ["c"] * len(texts), "turn_idx": range(len(texts)), "text": texts}
    )
    got = extract_frame(pdf)
    for i, t in enumerate(texts):
        want = extract_turn(t)
        assert got.extracted_text[i] == want["extracted_text"], (i, repr(t)[:200])
        assert got.spans[i] == want["spans"], (i, repr(t)[:200])
        assert got.status[i] == want["status"], (i, repr(t)[:200])
        assert int(got.n_blocks_in[i]) == want["n_blocks_in"]
        assert int(got.n_blocks_kept[i]) == want["n_blocks_kept"]


def test_parity_on_fixture_corpus():
    pdf = gen_transcripts(n_convs=120)
    _assert_frame_matches_scalar(pdf["text"].tolist())


def test_parity_on_torture_payloads():
    texts = [
        None,
        12345,
        "",
        "   \n\t\n  ",
        "<p></p><div></div>",
        "a" * 50,
        "word " * 500,
        '<nav><a href="/x">' + "nav link " * 30 + "</a></nav>",
        "line one with several words here\n" * 40,
        "    indented line with words\n" * 10 + "\n\n" + "flush line with words\n" * 10,
        "<a href='x'>" + "y" * 30,          # unclosed tag
        "text with \x00 control \x1f bytes and words in it here",
        "☃ unicode ❄ content with enough words to pass the gates ☃ ❄ yes",
        '{"status": "ok", "result": "tool payload with many words inside"}',
    ]
    _assert_frame_matches_scalar(texts)


_TOKENS = st.sampled_from(
    list("abc <>/ap.\n\t0123456789")
    + ["<p>", "</p>", "\n\n", "<a href='u'>", "</a>", "word ", "    "]
)


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.lists(_TOKENS, max_size=120).map("".join),
        min_size=1,
        max_size=8,
    )
)
def test_parity_hypothesis(texts):
    _assert_frame_matches_scalar(texts)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 255), min_size=0, max_size=80), st.sampled_from([1, 2, 3, 5, 21]))
def test_moving_average_batch_bitexact(q, w):
    x = np.array(q, dtype=np.int64)
    if len(x) == 0:
        return
    ref = moving_average(x, w)
    got = moving_average_batch(
        x.astype(np.float64)[None, :], min(w, len(x)), np.array([len(x)])
    )[0]
    assert np.array_equal(ref, got)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 255), min_size=0, max_size=60),
        min_size=1,
        max_size=10,
    )
)
def test_threshold_batch_bitexact(turns):
    lens = np.array([len(t) for t in turns], dtype=np.int64)
    q_flat = np.array([v for t in turns for v in t], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
    tids = np.repeat(np.arange(len(turns)), lens)
    got_a = adaptive_candidates_batch(q_flat, starts, lens)
    got_o = otsu_split_batch(q_flat, tids, starts, lens, len(turns))
    for i, t in enumerate(turns):
        q = np.array(t, dtype=np.int64)
        s = starts[i]
        assert np.array_equal(adaptive_candidates(q), got_a[s : s + lens[i]])
        assert otsu_split(q) == got_o[i]
