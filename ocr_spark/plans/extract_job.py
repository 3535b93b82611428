"""The distributed extraction plan (SURVEY.md §3.4):

  read -> bucket = pmod(xxhash64(conv_id), B) -> resume anti-join ->
  slice salting -> repartition(bucket, salt)  [the ONE wide op] ->
  mapInPandas(extract_turns) -> sortWithinPartitions(conv_id, turn_idx)
  -> write parquet partitioned by bucket (dynamic overwrite = idempotent
  per-bucket re-runs) + lineage rows.

Scale design (10^12-turn framing, BASELINE.json north_rule):
  - bucketing by hashed conv_id keeps conversations together for
    ordering while bounding lineage/resume granularity to B units;
  - skew is handled by STATIC slice salting (salt = turn_idx div
    SALT_SLICE_TURNS): conversations shorter than the slice stay whole,
    mega-conversations split into bounded slices.  No pre-scan of the
    input — the job reads it exactly once.  Safe because the hot path is
    a pure per-turn map (no per-conversation aggregation), SURVEY.md
    §4.3.  The legacy detect-and-salt path (detect_hot_buckets +
    with_salt) remains for diagnostics, with optional sampling;
  - everything before/after the single repartition is narrow; AQE
    handles post-shuffle coalescing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ocr_spark.constants import (
    DEFAULT_N_BUCKETS,
    HOT_FACTOR,
    K_SALT,
    SALT_SLICE_TURNS,
)
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


def detect_hot_buckets(
    df: DataFrame, sample_fraction: float | None = None
) -> list[int]:
    """DIAGNOSTIC-ONLY skew probe: buckets with > HOT_FACTOR * mean rows.

    Not on the job's hot path (plan_extract/run_extract use zero-prescan
    slice salting) because even though it collects at most n_buckets tiny
    rows, it costs one extra scan + shuffle of the input before the real
    job starts — at 100 TB that doubles input I/O.  For ad-hoc skew
    triage on large inputs pass `sample_fraction` (e.g. 0.001): relative
    bucket weights survive sampling, so the HOT_FACTOR ratio test is
    unchanged while the shuffled volume shrinks 1000x.
    """
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=7)
    counts = df.groupBy("bucket").count().collect()
    if not counts:
        return []
    mean = sum(r["count"] for r in counts) / len(counts)
    return [r["bucket"] for r in counts if r["count"] > HOT_FACTOR * mean]


def with_salt(df: DataFrame, hot: list[int], k_salt: int = K_SALT) -> DataFrame:
    """Legacy detect-based salting (diagnostic companion to
    detect_hot_buckets): salt = pmod(xxhash64(conv_id, turn_idx), K) for
    hot buckets only.  The hot path uses with_slice_salt instead.

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


def with_slice_salt(
    df: DataFrame, slice_turns: int = SALT_SLICE_TURNS
) -> DataFrame:
    """Static skew split with ZERO pre-scan: salt = turn_idx div
    slice_turns.

    Conversations with < slice_turns turns (the overwhelming majority at
    any scale) get the constant salt 0 and stay whole within their
    bucket; a mega-conversation is split into slices of at most
    slice_turns turns, each hashing to its own partition under the
    (bucket, salt) repartition.  Deterministic and input-size-oblivious,
    so the flagship job scans its input exactly once — no
    groupBy().count() pre-pass (the round-1 approach doubled input I/O
    at scale).
    """
    return df.withColumn(
        "salt", F.expr(f"cast(turn_idx div {int(slice_turns)} as int)")
    )


def stable_order(df: DataFrame) -> DataFrame:
    """O6/north_rule: restore stable (conv_id, turn_idx) ordering via a
    window row_number — the reading-order restoration (G11 analogue).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return df.withColumn("turn_rank", F.row_number().over(w))


def _salted_shuffle(
    df: DataFrame,
    salt_hot: bool,
    slice_turns: int,
    num_partitions: int | None,
) -> DataFrame:
    """The ONE wide op, shared by plan_extract and run_extract so the
    batch and resume paths cannot drift: slice salt -> repartition on
    (bucket, salt) -> per-partition sort.

    Sort BEFORE the UDF: mapInPandas preserves per-partition row order,
    so sorting the (slim) input rows gives ordered output for free —
    sorting the output would re-sort fat extracted_text+spans rows.
    """
    s = (
        with_slice_salt(df, slice_turns)
        if salt_hot
        else df.withColumn("salt", F.lit(0))
    )
    return s.repartition(
        num_partitions or _udf_stage_partitions(df),
        F.col("bucket"),
        F.col("salt"),
    ).sortWithinPartitions("conv_id", "turn_idx")


def plan_extract(
    df: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
    salt_hot: bool = True,
    num_partitions: int | None = None,
    slice_turns: int = SALT_SLICE_TURNS,
) -> DataFrame:
    """Build the extraction DataFrame (no I/O, no planning-time jobs):
    bucket -> slice salt -> repartition -> mapInPandas -> per-partition
    sort.  The input is scanned exactly once when the plan executes."""
    b = with_bucket(df, n_buckets)
    out = extract_turns(_salted_shuffle(b, salt_hot, slice_turns, num_partitions))
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
    slice_turns: int = SALT_SLICE_TURNS,
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

    shuffled = _salted_shuffle(df, salt_hot, slice_turns, num_partitions)
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
        "slice_turns": slice_turns if salt_hot else None,
    }
    return stats
