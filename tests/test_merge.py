"""G12/G13 pad + merge unit tests (mirror the overlap-merge cases,
FIXTURES.md §3 / reference merge loop predict.py:119-138)."""

from ocr_spark.extract.merge import merge_spans, pad_span


def test_pad_clamped_to_raw_bounds():
    canon = "<p>  hello world of text  </p>"
    # stripped block = "hello world of text" at [4, 23), raw gap [3, 26)
    lo, hi = pad_span(canon, 4, 23, 3, 26)
    assert lo >= 3 and hi <= 26
    # snapped back to non-whitespace
    assert not canon[lo].isspace() and not canon[hi - 1].isspace()


def test_pad_minimum_two():
    canon = "aa bb cc"
    lo, hi = pad_span(canon, 3, 5, 0, 8)  # "bb", pad = max(0.3, 2) = 2
    assert (lo, hi) == (1, 7)  # expanded by exactly 2 per side


def test_merge_whitespace_gap():
    canon = "first block\n\nsecond block"
    out = merge_spans(canon, [(0, 11, 0.8), (13, 25, 0.9)])
    assert out == [(0, 25, 0.9)]


def test_merge_overlapping():
    canon = "abcdefghij"
    out = merge_spans(canon, [(0, 5, 0.7), (3, 9, 0.8)])
    assert out == [(0, 9, 0.8)]


def test_no_merge_across_text_gap():
    canon = "first part MIDDLE second part"
    out = merge_spans(canon, [(0, 10, 0.9), (18, 29, 0.8)])
    assert out == [(0, 10, 0.9), (18, 29, 0.8)]


def test_merge_score_is_max():
    canon = "aaa bbb"
    out = merge_spans(canon, [(0, 3, 0.71), (4, 7, 0.95)])
    assert out == [(0, 7, 0.95)]


def test_merge_empty():
    assert merge_spans("x", []) == []
