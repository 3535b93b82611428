"""End-to-end per-turn pipeline tests — each case mirrors a reference test
(/root/reference/tests/test_handwriting.py, see FIXTURES.md §3 mapping)."""

import numpy as np
import pandas as pd

from ocr_spark.extract import extract_frame, extract_turn

NAV = '<nav><a href="/h">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>'
CONTENT = "<p>This paragraph is the genuine main content of the page with plenty of words.</p>"
CONTENT2 = "<p>A second real paragraph follows with even more meaningful words in it.</p>"
FOOTER = '<footer>Copyright <a href="/t">Terms</a> <a href="/p">Privacy</a></footer>'


def test_single_content_block():
    # mirrors the single-digit test (test_handwriting.py:10-36)
    r = extract_turn(NAV + CONTENT + FOOTER)
    assert r["status"] == "ok"
    assert len(r["spans"]) == 1
    assert r["spans"][0]["position"] == 1
    assert "genuine main content" in r["extracted_text"]
    assert "Home" not in r["extracted_text"]
    assert "Copyright" not in r["extracted_text"]


def test_all_boilerplate_empty():
    # mirrors the low-confidence -> empty+message test (:38-57)
    r = extract_turn(NAV + FOOTER)
    assert r["status"] == "empty"
    assert r["extracted_text"] == ""
    assert r["spans"] == []


def test_malformed_payload_error_row():
    # mirrors the model-load-failure -> error envelope test (:59-68)
    for bad in [None, 123, b"bytes", 4.5]:
        r = extract_turn(bad)
        assert r["status"] == "error"
        assert r["extracted_text"] == ""
        assert r["spans"] == []


def test_two_blocks_order_and_concat():
    # mirrors the two-region ordering test (summary=='37', :70-101)
    r = extract_turn(CONTENT + NAV + CONTENT2)
    assert r["status"] == "ok"
    assert len(r["spans"]) == 2
    assert [s["position"] for s in r["spans"]] == [1, 2]
    assert r["spans"][0]["start"] < r["spans"][1]["start"]
    first, second = r["extracted_text"].split("\n")
    assert "genuine main content" in first
    assert "second real paragraph" in second


def test_envelope_fields():
    # mirrors the response-format test (:103-126)
    r = extract_turn(CONTENT)
    assert set(r) == {
        "extracted_text",
        "spans",
        "n_blocks_in",
        "n_blocks_kept",
        "status",
    }
    for s in r["spans"]:
        assert set(s) == {"start", "end", "score", "position"}
        assert isinstance(s["position"], int) and s["position"] >= 1
        assert 0.0 <= s["score"] <= 1.0


def test_degenerate_payloads():
    assert extract_turn("")["status"] == "empty"
    assert extract_turn("   \n \t ")["status"] == "empty"
    # single giant unbroken block -> whole-turn fallback (G14)
    giant = "word " * 500
    r = extract_turn(giant)
    assert r["status"] == "ok"
    assert r["n_blocks_in"] >= 1
    assert r["extracted_text"].startswith("word")


def test_footer_zone_rejected():
    # short trailing block in the last 10% of the payload is dropped (G8)
    body = ("<p>" + "meaningful content words here again and again. " * 20 + "</p>")
    r = extract_turn(body + "<p>tiny footer note</p>")
    assert "tiny footer note" not in r["extracted_text"]


def test_gap_close_rescues_sandwiched_block():
    # a single low-density block between two high-density content blocks
    # becomes a candidate again (G5); it must still pass the later gates
    mid = "<p>short mid block with some words</p>"
    r = extract_turn(CONTENT + mid + CONTENT2)
    assert r["status"] == "ok"


def test_spans_slice_invariant():
    # extracted_text is exactly the '\n'-join of span slices over the
    # canonical text (G24)
    from ocr_spark.extract.canon import canonicalize

    text = CONTENT + NAV + CONTENT2
    r = extract_turn(text)
    canon, _ = canonicalize(text)
    joined = "\n".join(canon[s["start"] : s["end"]] for s in r["spans"])
    assert joined == r["extracted_text"]


def test_extract_frame_batch():
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": np.array([0, 1, 0], dtype="int32"),
            "text": [NAV + CONTENT + FOOTER, "", None],
        }
    )
    out = extract_frame(pdf)
    assert list(out["status"]) == ["ok", "empty", "error"]
    assert out["turn_idx"].dtype == np.dtype("int32")
    assert list(out.columns) == [
        "conv_id",
        "turn_idx",
        "extracted_text",
        "spans",
        "n_blocks_in",
        "n_blocks_kept",
        "status",
    ]


def test_determinism():
    text = CONTENT + NAV + CONTENT2
    assert extract_turn(text) == extract_turn(text)


def test_zero_density_payload_not_content():
    # garbage with no alphanumeric signal must not survive the
    # whole-turn fallback (found by probing: control bytes / bare '<'s)
    for t in ["\x00\x01\x02", "<" * 500, "!!! ??? ... ---"]:
        r = extract_turn(t)
        assert r["status"] == "empty", (t[:20], r)
