"""Conversation-level document assembly (grouped-map operator).

The training-data stage after per-turn extraction: stitch a
conversation's cleaned turns, in turn order, into one training document.
Implemented as `groupBy(conv_id).applyInPandas` — the grouped-map UDF
surface (mapInPandas handles the per-turn pipeline, scalar pandas_udfs
the SQL-composable wrappers, applyInPandasWithState the streaming
assembly; this completes the matrix for batch per-group logic).

Scale notes: applyInPandas shuffles by conv_id — one wide op — and each
group materializes as a single pandas frame, so a conversation must fit
in worker memory.  That holds by construction here: upstream slice
salting bounds pathological conversations, and MAX_TURN_CHARS bounds a
turn; for mega-conversations beyond memory, assemble per (conv_id,
salt-slice) first and concatenate slices second (same operator, applied
twice).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

ASSEMBLY_SCHEMA_DDL = "conv_id string, n_turns bigint, doc_text string"
TURN_SEPARATOR = "\n\n"


def _assemble_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("turn_idx")
    return pd.DataFrame(
        {
            "conv_id": [pdf["conv_id"].iloc[0]],
            "n_turns": pd.array([len(pdf)], dtype="int64"),
            "doc_text": [TURN_SEPARATOR.join(pdf["extracted_text"])],
        }
    )


def assemble_conversations(extracted: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, extracted_text, ...) -> one row per
    conversation with the turn-ordered document text.  Empty turns
    contribute empty segments (separators preserved) so offsets stay
    reconstructible.

    The explicit repartition is load-bearing (PLANS.md invariant #3):
    grouped-map is per-group-overhead-bound, and AQE's byte-based
    coalescing collapses the small-but-numerous-groups shuffle to ONE
    task (measured 11.5 s for 500 groups serial vs ~0.5 s spread).  A
    user repartition on the grouping key satisfies applyInPandas's
    distribution requirement, is not AQE-coalescible, and pins the stage
    width to 2x cores."""
    import pyspark.sql.functions as F

    from ocr_spark.plans.extract_job import _udf_stage_partitions

    pruned = extracted.select("conv_id", "turn_idx", "extracted_text")
    return (
        pruned.repartition(_udf_stage_partitions(extracted), F.col("conv_id"))
        .groupBy("conv_id")
        .applyInPandas(_assemble_group, schema=ASSEMBLY_SCHEMA_DDL)
    )
