"""Low-latency single-payload serving path (S-path parity).

The reference's primary entry is a per-request serving endpoint
(`POST /api/digit_recognize`, /root/reference/handwriting/api.py:9-40):
one payload in, one result envelope out, failures isolated per request.
The engine's batch and streaming surfaces cover the corpus side; this
module completes the lifecycle map with the per-payload side — and it
needs NO Spark, because the extraction kernel is a pure function of one
payload (the same property that makes the distributed job byte-exact
against the single-process oracle).

`serve_one` returns the same fields the batch pipeline writes for the
same text (pinned by tests/test_serve.py), wrapped in the reference's
success/error envelope shape (predict.py:283-299):

  {"success": True,  "extracted_text": ..., "spans": [...],
   "n_blocks_in": ..., "n_blocks_kept": ..., "status": "ok"|"empty"}
  {"success": False, "error": ..., "status": "error"}

CLI harness mirrors the reference's `python test_predict.py <image>`
(/root/reference/test_predict.py:6-16):

  python -m ocr_spark.serve "<payload text>"     # or - to read stdin
"""

from __future__ import annotations

import json
import sys
from typing import Any

from ocr_spark.extract.extractor import extract_turn


def serve_one(text: Any) -> dict:
    """Extract one payload; never raises (G26 per-request isolation)."""
    env = extract_turn(text)
    if env["status"] == "error":
        return {
            "success": False,
            "error": "payload could not be processed",
            "status": "error",
        }
    return {
        "success": True,
        "extracted_text": env["extracted_text"],
        "spans": env["spans"],
        "n_blocks_in": env["n_blocks_in"],
        "n_blocks_kept": env["n_blocks_kept"],
        "status": env["status"],
    }


def main(argv: list[str] | None = None) -> int:
    args = sys.argv[1:] if argv is None else argv
    if len(args) != 1:
        print("usage: python -m ocr_spark.serve <text | ->", file=sys.stderr)
        return 2
    payload = sys.stdin.read() if args[0] == "-" else args[0]
    print(json.dumps(serve_one(payload)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
