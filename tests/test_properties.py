"""Property-based invariants (SURVEY.md §5.2.5) — beyond the reference's
test strategy: hypothesis over arbitrary unicode payloads."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_spark.extract import extract_turn
from ocr_spark.extract.canon import canonicalize


@given(st.text(max_size=2000))
@settings(max_examples=200, deadline=None)
def test_never_raises_and_envelope_valid(text):
    r = extract_turn(text)
    assert r["status"] in ("ok", "empty", "error")
    assert r["n_blocks_kept"] == len(r["spans"])
    if r["status"] != "ok":
        assert r["extracted_text"] == "" and r["spans"] == []


@given(st.text(max_size=2000))
@settings(max_examples=200, deadline=None)
def test_spans_sorted_disjoint_positions(text):
    r = extract_turn(text)
    prev_end = -1
    for i, s in enumerate(r["spans"]):
        assert s["start"] >= 0
        assert s["start"] < s["end"]
        assert s["start"] > prev_end  # strictly disjoint, ordered
        assert s["position"] == i + 1
        prev_end = s["end"]


@given(st.text(max_size=2000))
@settings(max_examples=200, deadline=None)
def test_slice_invariant(text):
    r = extract_turn(text)
    canon, _ = canonicalize(text)
    joined = "\n".join(canon[s["start"] : s["end"]] for s in r["spans"])
    assert joined == r["extracted_text"]


@given(st.text(max_size=2000))
@settings(max_examples=100, deadline=None)
def test_deterministic(text):
    assert extract_turn(text) == extract_turn(text)
