"""G6/G11 segmentation unit tests (mirror reference segmentation tests,
/root/reference/tests/test_handwriting.py:22-26,89-94 style: handcrafted
minimal inputs with known block structure)."""

from ocr_spark.extract.canon import canonicalize
from ocr_spark.extract.segment import segment


def seg(text):
    canon, _ = canonicalize(text)
    return canon, segment(canon)


def test_html_block_split():
    canon, blocks = seg("<p>first para</p><div>second block</div>")
    texts = [canon[b.start : b.end] for b in blocks]
    assert texts == ["first para", "second block"]


def test_blank_line_split():
    canon, blocks = seg("para one here\n\npara two there")
    texts = [canon[b.start : b.end] for b in blocks]
    assert texts == ["para one here", "para two there"]


def test_blank_line_with_spaces_splits():
    canon, blocks = seg("para one\n   \npara two")
    assert len(blocks) == 2


def test_single_newline_does_not_split():
    canon, blocks = seg("line one\nline two")
    assert len(blocks) == 1


def test_inline_tags_stay_in_block():
    canon, blocks = seg("<p>text with <a href='x'>a link</a> inside</p>")
    assert len(blocks) == 1
    assert "<a" in canon[blocks[0].start : blocks[0].end]


def test_layout_runs_split_on_indent_jump():
    # >= LAYOUT_MIN_LINES lines; title indented 20, body indented 0
    text = (" " * 20 + "TITLE LINE\nbody a\nbody b\nbody c\nbody d")
    canon, blocks = seg(text)
    texts = [canon[b.start : b.end] for b in blocks]
    assert len(blocks) == 2
    assert texts[0] == "TITLE LINE"
    assert texts[1].startswith("body a")


def test_layout_runs_same_indent_one_run():
    text = "l1\nl2\nl3\nl4\nl5"
    canon, blocks = seg(text)
    assert len(blocks) == 1


def test_offsets_monotone_and_stripped():
    canon, blocks = seg("<p>  padded  </p>\n\n  x y z  ")
    for b in blocks:
        s = canon[b.start : b.end]
        assert s == s.strip()
    starts = [b.start for b in blocks]
    assert starts == sorted(starts)


def test_empty_and_whitespace():
    for t in ["", "   ", "\n\n\n", "<p></p>"]:
        canon, blocks = seg(t)
        assert blocks == []
