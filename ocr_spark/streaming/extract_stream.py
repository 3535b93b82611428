"""Structured Streaming surface for the extraction pipeline.

The batch north rule is resume-from-checkpoint batch (SURVEY.md §2.11),
but the same per-turn operator runs unchanged as a continuous pipeline:
`readStream` over an arriving-files transcripts directory →
`extract_turns` (stateless mapInPandas — the whole G1-G26 pipeline) →
`writeStream` parquet sink with Spark's own checkpointing.

Design notes (scale):
  - The extractor is a pure per-row map, so the streaming query is
    STATELESS: no watermarks or state store, exactly-once via the file
    sink's transaction log + source offsets in the checkpoint dir.  This
    is the streaming twin of the batch job's lineage/anti-join resume.
  - No repartition-by-bucket here: micro-batches are already bounded by
    `maxFilesPerTrigger`, and a shuffle per micro-batch would add latency
    for no ordering benefit (the sink is keyed by (conv_id, turn_idx);
    stable ordering is restored at read time, same contract as batch).
  - `available_now=True` drains the backlog then stops — used by tests
    and backfills; production leaves it False for continuous tailing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ocr_spark.operators.extract_op import extract_turns
from ocr_spark.sources.transcripts import TRANSCRIPTS_SCHEMA


def stream_transcripts(
    spark: SparkSession, input_path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """S1 streaming twin: a file-arrival stream of transcript parquet.
    Schema must be declared for streaming sources (no inference)."""
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger is not None:
        if max_files_per_trigger <= 0:
            raise ValueError(
                f"max_files_per_trigger must be positive, got {max_files_per_trigger}"
            )
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_path)


def run_turn_rate_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = False,
    watermark: str = "30 minutes",
    window: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Stateful streaming aggregation with late-data handling: turns per
    (event-time window, role), watermarked.

    Append mode + watermark = a window emits exactly once, when the
    watermark (max event time - `watermark`) passes its end; turns later
    than the watermark are dropped rather than corrupting closed windows.
    This is the monitoring-side twin of the extraction stream (per-window
    turn rates feed capacity planning for the 10^12-turn pipeline); state
    is bounded by watermark horizon, not stream length.
    """
    import pyspark.sql.functions as F

    turns = stream_transcripts(spark, input_path, max_files_per_trigger)
    agg = (
        turns.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "role",
            "n_turns",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_extract_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start the streaming extraction query (returns the live query)."""
    turns = stream_transcripts(spark, input_path, max_files_per_trigger)
    extracted = extract_turns(turns)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_enrich_stream(
    spark: SparkSession,
    input_path: str,
    dim_df: DataFrame,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Stream-static enrichment join: each streaming turn is joined
    against a STATIC dimension table (e.g. conversation metadata /
    language routing) on conv_id.  Stream-static joins are stateless —
    no watermark, no join state to grow: every micro-batch re-plans
    against the current static side, and a small dimension broadcasts,
    so at 10^12 turns this stays a per-batch map-side hash join.  Left
    join: an unmatched turn passes through with NULL enrichment (the
    ingest contract never drops data because a dim row is late)."""
    turns = stream_transcripts(spark, input_path, max_files_per_trigger)
    enriched = turns.join(dim_df, "conv_id", "left")
    writer = (
        enriched.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_dedup_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = False,
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Streaming exact dedup (P1's continuous twin): drop turns whose
    payload hash was already seen within the watermark horizon.

    `dropDuplicatesWithinWatermark` keys state on md5(text) and — unlike
    plain dropDuplicates — EVICTS state once the watermark passes an
    entry, so state is bounded by (dedup horizon x arrival rate), not by
    stream length: the property that matters at 10^12 turns.  Duplicates
    separated by more than the horizon are deliberately kept (the batch
    exact-dedup pass downstream owns cross-horizon dedup; typical
    crawl/ingest duplicates cluster tightly in time).

    NULL-text turns are NOT duplicates of each other (a missing payload
    is not a repeated payload): they get a per-row key and always pass
    through.  Empty-string payloads DO dedup against each other.
    """
    import pyspark.sql.functions as F

    turns = stream_transcripts(spark, input_path, max_files_per_trigger)
    dedup_key = F.when(
        F.col("text").isNotNull(), F.md5("text")
    ).otherwise(F.concat_ws("#", F.lit("null"), "conv_id", "turn_idx"))
    deduped = (
        turns.withColumn("text_md5", dedup_key)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["text_md5"])
        .drop("text_md5")
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


DECON_GRAM_WORDS = 13


def bench_gram_fingerprints(texts: list[str], gram: int = DECON_GRAM_WORDS) -> list[str]:
    """Fixed-width 16-hex md5 fingerprints of every `gram`-word shingle
    of the given benchmark texts, under the SAME canonicalization the
    stream side applies (lowercase, letters-only, collapsed whitespace).
    Pure Python on purpose: the benchmark suite is driver-resident and
    tiny (MMLU-sized), and the list is injected into the streaming plan
    as a literal — the streaming analogue of a broadcast variable."""
    import hashlib
    import re

    out: set[str] = set()
    for t in texts:
        ws = re.sub(r" +", " ", re.sub(r"[^A-Za-z ]", " ", t.lower())).strip()
        words = ws.split(" ") if ws else []
        for i in range(len(words) - gram + 1):
            key = " ".join(words[i : i + gram])
            out.add(hashlib.md5(key.encode()).hexdigest()[:16])
    return sorted(out)


def run_decontam_stream(
    spark: SparkSession,
    input_path: str,
    bench_grams: list[str],
    output_path: str,
    checkpoint_path: str,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
    gram: int = DECON_GRAM_WORDS,
) -> StreamingQuery:
    """Streaming benchmark decontamination (P36's continuous twin): flag
    turns sharing any `gram`-word shingle with a held-out benchmark set
    WHILE the corpus is being ingested, so contaminated documents never
    reach the training sink at all.

    The benchmark fingerprint set is injected as an ARRAY LITERAL (see
    bench_gram_fingerprints) rather than joined: benchmark suites are
    tiny and static, so this is a pure stateless per-row map — no
    stream-static join to re-plan, no watermark, no state store; state
    per row is O(|bench| + turn length), and exactly-once comes from the
    file sink's transaction log, same as run_extract_stream.  n_hits
    counts DISTINCT matching shingles (array_intersect semantics — the
    batch P36 counts occurrences; a turn is contaminated under either
    definition iff n_hits > 0, which is the gate that matters).
    """
    import pyspark.sql.functions as F

    turns = stream_transcripts(spark, input_path, max_files_per_trigger)
    canon = F.lower(F.trim(F.regexp_replace(F.col("text"), r"[^A-Za-z ]", " ")))
    ws = F.split(F.trim(F.regexp_replace(canon, r" +", " ")), " ")
    grams = F.expr(
        f"if(size(ws) >= {gram},"
        f" transform(sequence(1, size(ws) - {gram - 1}),"
        f" i -> substring(md5(array_join(slice(ws, i, {gram}), ' ')), 1, 16)),"
        f" array())"
    )
    # empty-set cast keeps array_intersect type-resolved when the
    # benchmark list is empty (array() alone is array<void>)
    bench = (
        F.array(*[F.lit(g) for g in bench_grams])
        if bench_grams
        else F.array().cast("array<string>")
    )
    flagged = (
        turns.withColumn("ws", ws)
        .withColumn("g", grams)
        .select(
            "conv_id",
            "turn_idx",
            "ts",
            F.size("g").cast("long").alias("n_grams"),
            F.size(F.array_intersect("g", bench)).cast("long").alias("n_hits"),
        )
        .withColumn("contaminated", F.col("n_hits") > 0)
    )
    writer = (
        flagged.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
