"""Single-payload serving path (ocr_spark/serve.py): envelope parity with
the batch kernel, per-request failure isolation, CLI harness."""

import json
import subprocess
import sys

import pandas as pd

from ocr_spark.extract import extract_frame
from ocr_spark.serve import serve_one


def test_serve_matches_batch_kernel():
    text = (
        '<nav><a href="/x">Nav</a></nav><p>Real content with several '
        "meaningful words in this block of text.</p>"
        '<footer>Copyright <a href="/t">T</a></footer>'
    )
    env = serve_one(text)
    batch = extract_frame(
        pd.DataFrame({"conv_id": ["c"], "turn_idx": [0], "text": [text]})
    ).iloc[0]
    assert env["success"] is True
    assert env["extracted_text"] == batch["extracted_text"]
    assert env["status"] == batch["status"]
    assert env["n_blocks_kept"] == batch["n_blocks_kept"]
    assert [
        (s["start"], s["end"], s["position"]) for s in env["spans"]
    ] == [(s["start"], s["end"], s["position"]) for s in batch["spans"]]


def test_serve_error_isolation():
    env = serve_one(None)
    assert env == {
        "success": False,
        "error": "payload could not be processed",
        "status": "error",
    }
    assert serve_one(12345)["success"] is False


def test_serve_empty_outcome_not_error():
    # all-markup payload -> explicit empty outcome (G25), not an error
    env = serve_one('<nav><a href="/a">A</a> <a href="/b">B</a></nav>')
    assert env["success"] is True
    assert env["status"] == "empty"
    assert env["extracted_text"] == ""


def test_serve_cli():
    res = subprocess.run(
        [sys.executable, "-m", "ocr_spark.serve", "-"],
        input="Plain text with enough meaningful words to keep as content.",
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert res.returncode == 0, res.stderr
    out = json.loads(res.stdout)
    assert out["success"] is True and out["status"] == "ok"
