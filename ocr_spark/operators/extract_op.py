"""The distributed extraction operator (SURVEY.md §2.10).

`extract_turns` is the UDTF-shaped whole-pipeline operator
(generalizing predict_from_pil_image, /root/reference/handwriting/
predict.py:212-299) as a mapInPandas over Arrow batches: per batch of
turns, the pure `extract_frame` runs NumPy-vectorized — no per-row Python
UDFs anywhere (input_hint mandate).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ocr_spark.extract.extractor import OUTPUT_SCHEMA_DDL, extract_frame


def _extract_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # G27: module import above = once-per-executor init of compiled
    # regexes/tables; nothing per-batch to (re)load.
    for pdf in it:
        yield extract_frame(pdf)


def extract_turns(df: DataFrame) -> DataFrame:
    """Run main-content extraction over a transcripts DataFrame.

    Narrow transformation (no shuffle of its own): partitioning is the
    caller's concern (plans/extract_job.py buckets + salts first).
    Input needs columns (conv_id, turn_idx, text); output schema is
    OUTPUT_SCHEMA_DDL.
    """
    # Column-prune before the Arrow transfer: ship only what the UDF
    # reads (role/tool/ts stay JVM-side).
    pruned = df.select("conv_id", "turn_idx", "text")
    return pruned.mapInPandas(_extract_batches, schema=OUTPUT_SCHEMA_DDL)
