"""Streaming HyperLogLog — the continuous twin of the batch distinct
sketch (P29, `__spark_entry__._q_hll_distinct`).

The whole point of choosing HLL registers as the distinct summary is
that they merge by MAX — which makes the streaming twin a NATIVE
watermarked max-aggregate, no custom state operator at all:

    words -> (window, lang, register j) -> max(rho)

Append mode + watermark = each (window, lang, j) register row emits
exactly once, when the watermark closes its window; per-partition and
per-micro-batch partial maxes combine in the state store exactly like
map-side combine does in batch.  Downstream consumers fold register
rows to cardinality estimates with `hll_estimate` (the same integer
fixed-point arithmetic as the batch query — no float libm anywhere),
and can UNION register streams from independent pipelines before
folding, because max-merge is associative/commutative/idempotent.
That idempotence is also what makes the sink safely reprocessable: a
replayed register row can never change a folded estimate.

State bound: one long per (open window, lang, register) — at most
64 x |langs| live cells per window horizon, independent of stream
length or cardinality.  Constants mirror __spark_entry__ (duplicated
because ocr_spark.zip ships without the repo root).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

HLL_M = 64                              # registers (p = 6)
HLL_S = 1 << 30                         # fixed-point scale for Z
_ALPHA_NUM, _ALPHA_DEN = 709, 1000      # alpha_64 = 0.709

DOCS_STREAM_SCHEMA = "doc_id long, lang string, text string, ts timestamp"


def hll_register_columns(df: DataFrame) -> DataFrame:
    """(lang, text, ts) -> one row per distinct-ish word occurrence with
    its (j, rho) register coordinates.  Stateless, identical expressions
    to the batch query so stream and batch registers are comparable
    value-for-value."""
    canon = F.lower(F.trim(F.regexp_replace(F.col("text"), r"[^A-Za-z ]", " ")))
    words = df.select(
        "lang",
        "ts",
        F.explode(
            F.split(F.trim(F.regexp_replace(canon, r" +", " ")), " ")
        ).alias("w"),
    ).filter(F.length("w") >= 4)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll:"), F.col("w"))), 1, 15), 16, 10
    ).cast("long")
    hw = words.select("lang", "ts", h.alias("h")).select(
        "lang",
        "ts",
        (F.col("h") % HLL_M).alias("j"),
        F.expr(f"h div {HLL_M}").alias("h2"),
    )
    rho = F.when(F.col("h2") == 0, F.lit(55)).otherwise(
        F.lit(55) - F.length(F.expr("bin(h2)"))
    )
    return hw.select("lang", "ts", "j", rho.alias("m"))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """Fold (group-cols..., j, m) register rows to per-group cardinality
    estimates — integer fixed-point, exactly the batch arithmetic.
    Registers from multiple sources may be unioned first: max-merge is
    associative and idempotent."""
    group_cols = [c for c in registers.columns if c not in ("j", "m")]
    merged = registers.groupBy(*group_cols, "j").agg(F.max("m").alias("m"))
    per = merged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_set"),
        F.sum(F.expr(f"shiftright({HLL_S}, m)")).alias("z_set"),
    )
    z = F.col("z_set") + (F.lit(HLL_M) - F.col("n_set")) * F.lit(HLL_S)
    est = F.expr(
        f"({_ALPHA_NUM} * {HLL_M} * {HLL_M} * cast({HLL_S} as bigint))"
        f" div ({_ALPHA_DEN} * z_fp)"
    )
    return (
        per.withColumn("z_fp", z.cast("long"))
        .select(*group_cols, est.cast("long").alias("est_distinct"))
    )


def run_hll_register_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = False,
    watermark: str = "30 minutes",
    window: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Continuous per-(event-time window, lang) HLL register stream over
    arriving document files.  Emits each closed window's 64-register
    table exactly once (append mode); fold with `hll_estimate`."""
    reader = spark.readStream.schema(DOCS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        if max_files_per_trigger <= 0:
            raise ValueError(
                f"max_files_per_trigger must be positive, got {max_files_per_trigger}"
            )
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_path)

    regs = (
        hll_register_columns(docs)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("lang"), F.col("j"))
        .agg(F.max("m").alias("m"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "lang",
            "j",
            "m",
        )
    )

    writer = (
        regs.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming Count-Min (P62) — the continuous twin of the batch frequency
# sketch (P21, `__spark_entry__._q_countmin_sketch`).
# ---------------------------------------------------------------------------
#
# Count-Min cells merge by SUM, so — like the HLL registers above — the
# streaming twin is a NATIVE watermarked aggregate, no custom state
# operator: words -> (window, row_id, col_id) -> count(*).  Append mode
# emits each closed window's 4x256 cell table exactly once.  One honest
# contrast with HLL: sum-merge is associative/commutative but NOT
# idempotent, so replay safety comes from the file sink's transaction
# log alone (the HLL stream is additionally immune at the algebra
# level).  State bound: at most 4*256 longs per (open window) horizon —
# fixed, independent of vocabulary or stream length; that fixed bound
# is exactly why a sketch (not an exact word count) is the streaming
# frequency summary at 100 TB.

CM_ROWS = 4                             # mirrors __spark_entry__._CM_ROWS
CM_COLS = 256                           # mirrors __spark_entry__._CM_COLS


def cm_cell_columns(df: DataFrame) -> DataFrame:
    """(text, ts) -> one row per (word occurrence x sketch row) with its
    (row_id, col_id) cell coordinates.  Stateless; identical expressions
    to the batch sketch so stream and batch cells compare value-exact."""
    canon = F.lower(F.trim(F.regexp_replace(F.col("text"), r"[^A-Za-z ]", " ")))
    words = df.select(
        "ts",
        F.explode(
            F.split(F.trim(F.regexp_replace(canon, r" +", " ")), " ")
        ).alias("w"),
    ).filter(F.length("w") > 0)
    cell = lambda r: (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cm{r}:"), F.col("w"))), 1, 15),
            16, 10,
        ).cast("long") % F.lit(CM_COLS)
    )
    cells = F.array(*[
        F.struct(F.lit(r).cast("long").alias("row_id"), cell(r).alias("col_id"))
        for r in range(CM_ROWS)
    ])
    return words.select("ts", F.explode(cells).alias("c")).select(
        "ts", "c.row_id", "c.col_id"
    )


def run_countmin_cell_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = False,
    watermark: str = "30 minutes",
    window: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Continuous per-(event-time window) Count-Min cell stream over
    arriving document files.  Emits each closed window's cell table
    exactly once (append mode); windows union by summing cnt."""
    reader = spark.readStream.schema(DOCS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        if max_files_per_trigger <= 0:
            raise ValueError(
                f"max_files_per_trigger must be positive, got {max_files_per_trigger}"
            )
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_path)

    cells = (
        cm_cell_columns(docs)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("row_id"), F.col("col_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "row_id",
            "col_id",
            "cnt",
        )
    )

    writer = (
        cells.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
