"""The distributed extraction plan (SURVEY.md §3.4):

  read -> bucket = pmod(xxhash64(conv_id), B) -> resume anti-join ->
  hot-bucket salting -> repartition(bucket, salt)  [the ONE wide op] ->
  mapInPandas(extract_turns) -> sortWithinPartitions(conv_id, turn_idx)
  -> write parquet partitioned by bucket (dynamic overwrite = idempotent
  per-bucket re-runs) + lineage rows.

Scale design (10^12-turn framing, BASELINE.json north_rule):
  - bucketing by hashed conv_id keeps conversations together for
    ordering while bounding lineage/resume granularity to B units;
  - salting splits hot conversations across K_SALT partitions — safe
    because the hot path is a pure per-turn map (no per-conversation
    aggregation), SURVEY.md §4.3;
  - everything before/after the single repartition is narrow; AQE
    handles post-shuffle coalescing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ocr_spark.constants import DEFAULT_N_BUCKETS, HOT_FACTOR, K_SALT
from ocr_spark.operators.extract_op import extract_turns
from ocr_spark.plans.lineage import completed_buckets, lineage_from_output


def _udf_stage_partitions(df: DataFrame) -> int:
    """Partition count for the CPU-bound mapInPandas stage: 2 tasks per
    core so stragglers overlap.  Passed EXPLICITLY to repartition because
    AQE's post-shuffle coalescing sizes partitions by shuffle bytes and
    would collapse a small-but-CPU-heavy input to a handful of tasks
    (observed: 4 tasks on 32 cores), starving the extraction stage.
    """
    return df.sparkSession.sparkContext.defaultParallelism * 2


def with_bucket(df: DataFrame, n_buckets: int = DEFAULT_N_BUCKETS) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets))
    )


def detect_hot_buckets(df: DataFrame) -> list[int]:
    """Pre-pass skew diagnosis: buckets with > HOT_FACTOR * mean rows.

    Collects at most n_buckets tiny rows to the driver — a bounded
    metadata collect, not a data collect.
    """
    counts = df.groupBy("bucket").count().collect()
    if not counts:
        return []
    mean = sum(r["count"] for r in counts) / len(counts)
    return [r["bucket"] for r in counts if r["count"] > HOT_FACTOR * mean]


def with_salt(df: DataFrame, hot: list[int], k_salt: int = K_SALT) -> DataFrame:
    """Salt only hot buckets: salt = pmod(xxhash64(conv_id, turn_idx), K).

    Cold buckets get salt 0 so their conversations stay whole; hot
    buckets trade within-partition conversation completeness for balance
    (re-established at read time by the ordering window).
    """
    if not hot:
        return df.withColumn("salt", F.lit(0))
    return df.withColumn(
        "salt",
        F.when(
            F.col("bucket").isin([int(b) for b in hot]),
            F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(k_salt)),
        ).otherwise(F.lit(0)),
    )


def stable_order(df: DataFrame) -> DataFrame:
    """O6/north_rule: restore stable (conv_id, turn_idx) ordering via a
    window row_number — the reading-order restoration (G11 analogue).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return df.withColumn("turn_rank", F.row_number().over(w))


def plan_extract(
    df: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
    salt_hot: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the extraction DataFrame (no I/O): bucket -> salt ->
    repartition -> mapInPandas -> per-partition sort."""
    b = with_bucket(df, n_buckets)
    hot = detect_hot_buckets(b) if salt_hot else []
    s = with_salt(b, hot)
    shuffled = s.repartition(
        num_partitions or _udf_stage_partitions(df), F.col("bucket"), F.col("salt")
    )
    # Sort BEFORE the UDF: mapInPandas preserves per-partition row order,
    # so sorting the (slim) input rows gives ordered output for free —
    # sorting the output would re-sort fat extracted_text+spans rows.
    shuffled = shuffled.sortWithinPartitions("conv_id", "turn_idx")
    out = extract_turns(shuffled)
    return out.withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets))
    )


def run_extract(
    spark: SparkSession,
    df: DataFrame,
    output_path: str,
    lineage_path: str,
    run_id: str,
    n_buckets: int = DEFAULT_N_BUCKETS,
    salt_hot: bool = True,
    resume: bool = False,
    num_partitions: int | None = None,
) -> dict:
    """Execute the full job with resume + lineage.  Returns counters."""
    df = with_bucket(df, n_buckets)
    skipped = 0
    if resume:
        done = completed_buckets(spark, lineage_path, run_id)
        if done is not None:
            skipped = done.count()
            # resume anti-join (K3): pending = input \ completed buckets
            df = df.join(F.broadcast(done), "bucket", "left_anti")

    hot = detect_hot_buckets(df) if salt_hot else []
    s = with_salt(df, hot)
    shuffled = s.repartition(
        num_partitions or _udf_stage_partitions(df), F.col("bucket"), F.col("salt")
    ).sortWithinPartitions("conv_id", "turn_idx")
    out = extract_turns(shuffled).withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets))
    )

    # Idempotent per-bucket writes: dynamic partition overwrite replaces
    # exactly the buckets this run produced (SURVEY §4.3 resume row).
    # Destination routing (iceberg: prefix vs parquet path) lives in
    # sinks/writers.py; both honor the same overwrite contract.
    from ocr_spark.sinks.writers import read_output, write_extracted, write_lineage

    write_extracted(out, output_path)

    # Lineage from the written data (single extra columnar scan; the
    # extraction itself is not recomputed).
    written = read_output(spark, output_path)
    if skipped or resume:
        done = completed_buckets(spark, lineage_path, run_id)
        if done is not None:
            written = written.join(F.broadcast(done), "bucket", "left_anti")
    lin = lineage_from_output(written, run_id)
    write_lineage(lin, lineage_path)

    stats = {
        "buckets_skipped": skipped,
        "hot_buckets": len(hot),
    }
    return stats
