"""G28/K2-K3: per-bucket lineage + counters table; resume anti-join.

Generalizes the reference's per-item debug artifacts and model
checkpointing (/root/reference/handwriting/predict.py:247-248,
train_mnist.py:129-132) into the thing a 10^12-turn batch job actually
needs: a small table recording which (run_id, bucket) units completed,
with row/block counters, so a re-run resumes from checkpoint via a
LEFT ANTI join (SURVEY.md §2.7, §7.2 M3).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("bucket", T.LongType(), False),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_out", T.LongType(), True),
        T.StructField("blocks_kept", T.LongType(), True),
        T.StructField("blocks_dropped", T.LongType(), True),
        T.StructField("n_ok", T.LongType(), True),
        T.StructField("n_empty", T.LongType(), True),
        T.StructField("n_error", T.LongType(), True),
        T.StructField("finished_ts", T.TimestampType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)


def lineage_from_output(out: DataFrame, run_id: str) -> DataFrame:
    """Aggregate per-bucket counters from the extraction output.

    One output row exists per input row (G26 guarantees error isolation,
    never row loss), so rows_in == rows_out by construction and the
    counters double as an input audit.
    """
    return out.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("rows_out"),
        F.sum("n_blocks_kept").cast("long").alias("blocks_kept"),
        F.sum(F.col("n_blocks_in") - F.col("n_blocks_kept"))
        .cast("long")
        .alias("blocks_dropped"),
        F.sum((F.col("status") == "ok").cast("long")).alias("n_ok"),
        F.sum((F.col("status") == "empty").cast("long")).alias("n_empty"),
        F.sum((F.col("status") == "error").cast("long")).alias("n_error"),
    ).select(
        F.lit(run_id).alias("run_id"),
        F.col("bucket").cast("long"),
        F.col("rows_out").alias("rows_in"),
        "rows_out",
        "blocks_kept",
        "blocks_dropped",
        "n_ok",
        "n_empty",
        "n_error",
        F.current_timestamp().alias("finished_ts"),
        F.lit("done").alias("status"),
    )


def read_lineage(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.schema(LINEAGE_SCHEMA).parquet(path)
    except Exception:
        return None


def completed_buckets(spark: SparkSession, path: str, run_id: str) -> DataFrame | None:
    """Buckets already done for run_id, for the resume LEFT ANTI join."""
    lin = read_lineage(spark, path)
    if lin is None:
        return None
    return (
        lin.filter((F.col("run_id") == run_id) & (F.col("status") == "done"))
        .select("bucket")
        .distinct()
    )
