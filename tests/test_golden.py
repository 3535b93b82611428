"""Golden regression pin (SURVEY §2.1 S6 — the text analogue of the
reference's checked-in test images, /root/reference/test_image.jpg).

Unlike the oracle-parity suite (which shares code between both sides and
therefore cannot see a semantics drift that changes both), these committed
parquet fixtures freeze the extractor's OUTPUT BYTES across sessions: any
change to thresholds, ordering, merging, or float paths fails here and
must be a conscious, documented decision (regenerate via the snippet in
this file's docstring only when the semantics change is intended).

Regenerate:
    python - <<'PY'
    import json, pandas as pd
    from ocr_spark.extract import extract_frame
    inp = pd.read_parquet("tests/golden/transcripts_in.parquet")
    out = extract_frame(inp); out["spans_json"] = out["spans"].map(json.dumps)
    out.drop(columns=["spans"]).to_parquet(
        "tests/golden/extracted_expected.parquet", index=False)
    PY
"""

import json
import os

import pandas as pd

from ocr_spark.extract import extract_frame

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def test_golden_extraction_bytes():
    inp = pd.read_parquet(os.path.join(GOLDEN_DIR, "transcripts_in.parquet"))
    want = pd.read_parquet(
        os.path.join(GOLDEN_DIR, "extracted_expected.parquet")
    )
    got = extract_frame(inp)
    assert len(got) == len(want) == 554
    assert got["extracted_text"].tolist() == want["extracted_text"].tolist()
    assert got["status"].tolist() == want["status"].tolist()
    assert got["n_blocks_in"].tolist() == want["n_blocks_in"].tolist()
    assert got["n_blocks_kept"].tolist() == want["n_blocks_kept"].tolist()
    assert got["spans"].map(json.dumps).tolist() == want["spans_json"].tolist()


def test_golden_via_spark(spark):
    """The distributed operator over the same golden input matches the
    committed bytes too (read through Spark, extracted via mapInPandas)."""
    from ocr_spark.operators.extract_op import extract_turns

    sdf = spark.read.parquet(os.path.join(GOLDEN_DIR, "transcripts_in.parquet"))
    got = (
        extract_turns(sdf.repartition(8))
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        pd.read_parquet(os.path.join(GOLDEN_DIR, "extracted_expected.parquet"))
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got["extracted_text"].tolist() == want["extracted_text"].tolist()
    assert got["status"].tolist() == want["status"].tolist()
