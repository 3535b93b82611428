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


def run_quality_gate_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
    min_words: int = 5,
) -> StreamingQuery:
    """Streaming Gopher-style quality gate (P47's continuous twin): the
    MassiveText heuristic rules applied per turn DURING ingest, so junk
    payloads are flagged before they ever reach the training sink.

    Same integer-arithmetic predicates as the batch q_gopher_rules
    (symbols*10 < words encodes ratio < 0.1 — no float division), minus
    the required-stopword test: turn-level payloads are routinely a few
    words long, where a stopword test is noise; the batch rule applies
    it at document level after conversation assembly.  The word floor
    defaults to 5 (turns are shorter than documents).  Pure stateless
    per-row map: no state store, no watermark, exactly-once via the
    file sink's transaction log.
    """
    import pyspark.sql.functions as F

    turns = stream_transcripts(spark, input_path, max_files_per_trigger)
    canon = F.trim(
        F.regexp_replace(F.lower(F.coalesce(F.col("text"), F.lit(""))),
                         r"[ \t\r\n]+", " ")
    )
    t = turns.select(
        "conv_id", "turn_idx", "ts",
        F.when(F.length(canon) == 0, F.expr("array()"))
        .otherwise(F.split(canon, " "))
        .alias("ws"),
        F.split(F.coalesce(F.col("text"), F.lit("")), "\n").alias("lines"),
        F.coalesce(F.col("text"), F.lit("")).alias("page"),
    )
    t = t.select(
        "conv_id", "turn_idx", "ts",
        F.size("ws").cast("long").alias("n_words"),
        F.expr("aggregate(ws, 0L, (a, w) -> a + length(w))").alias("tot_chars"),
        F.expr("size(filter(ws, w -> w rlike '[a-z]'))").cast("long")
        .alias("alpha_words"),
        (
            F.length("page") - F.length(F.regexp_replace("page", r"#", ""))
            + F.floor(
                (F.length("page")
                 - F.length(F.expr("replace(page, '...', '')"))) / F.lit(3)
            )
        ).cast("long").alias("n_symbols"),
        F.size("lines").cast("long").alias("n_lines"),
        F.expr("size(filter(lines, l -> startswith(ltrim(l), '* ')))")
        .cast("long").alias("bullet_lines"),
        F.expr("size(filter(lines, l -> endswith(rtrim(l), '...')))")
        .cast("long").alias("ellipsis_lines"),
    )
    pass_wc = (F.col("n_words") >= min_words) & (F.col("n_words") <= 100000)
    pass_mwl = (
        (F.col("tot_chars") >= 3 * F.col("n_words"))
        & (F.col("tot_chars") <= 10 * F.col("n_words"))
        & (F.col("n_words") > 0)
    )
    pass_sym = F.col("n_symbols") * 10 < F.col("n_words")
    pass_bul = F.col("bullet_lines") * 10 < F.col("n_lines") * 9
    pass_ell = F.col("ellipsis_lines") * 10 < F.col("n_lines") * 3
    pass_alpha = F.col("alpha_words") * 10 >= F.col("n_words") * 8
    gated = t.select(
        "conv_id", "turn_idx", "ts", "n_words",
        pass_wc.alias("pass_word_count"),
        pass_mwl.alias("pass_mean_wlen"),
        pass_sym.alias("pass_symbol_ratio"),
        pass_bul.alias("pass_bullet"),
        pass_ell.alias("pass_ellipsis"),
        pass_alpha.alias("pass_alpha"),
        (pass_wc & pass_mwl & pass_sym & pass_bul & pass_ell & pass_alpha)
        .alias("pass_all"),
    )
    writer = (
        gated.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


DSIR_BUCKETS = 256


def dsir_ratio_table(
    raw_texts: list[str], target_texts: list[str], buckets: int = DSIR_BUCKETS
) -> list[int]:
    """Train the DSIR hashed-unigram importance-ratio table (bucket ->
    ratio_ppm) on the driver — the offline half of the classic
    offline-train / online-score split.  Pure Python with EXACTLY the
    batch q_importance_resample arithmetic (md5 bucket, add-1-smoothed
    ppb probabilities, two-step integer division), so a table trained
    here scores a stream identically to the batch operator scoring the
    same corpus.  At production scale the table comes from the batch
    job's 256-row stats output; either way it is a tiny list injected
    into the streaming plan as an array literal (broadcast-variable
    analogue, same pattern as bench_gram_fingerprints)."""
    import hashlib
    import re

    def words(t: str) -> list[str]:
        c = re.sub(r"[ \t\r\n]+", " ", t.lower()).strip()
        return [w for w in c.split(" ") if w] if c else []

    def bucket(w: str) -> int:
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % buckets

    r_cnt = [0] * buckets
    t_cnt = [0] * buckets
    for txt in raw_texts:
        for w in words(txt):
            r_cnt[bucket(w)] += 1
    for txt in target_texts:
        for w in words(txt):
            t_cnt[bucket(w)] += 1
    r_tot, t_tot = sum(r_cnt), sum(t_cnt)
    out = []
    for b in range(buckets):
        pt_ppb = (t_cnt[b] + 1) * 1000000000 // (t_tot + buckets)
        pr_ppb = (r_cnt[b] + 1) * 1000000000 // (r_tot + buckets)
        out.append(pt_ppb * 1000000 // max(pr_ppb, 1))
    return out


def run_importance_stream(
    spark: SparkSession,
    input_path: str,
    ratio_ppm: list[int],
    output_path: str,
    checkpoint_path: str,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Streaming DSIR importance scoring (P46's continuous twin): score
    every arriving turn against a FROZEN bucket-ratio table and gate it
    with the same md5 keep rule as the batch operator — train offline
    (dsir_ratio_table / the batch job's stats), score online.

    The 256-entry table rides into the plan as an array literal indexed
    by word bucket (streaming broadcast-variable analogue) — a pure
    stateless per-row map: no stream-static join to re-plan when the
    table refreshes (restart with a new literal instead, the standard
    model-rollout pattern), no state store.  The keep gate hashes
    (conv_id, turn_idx) so a turn's verdict is reproducible across
    restarts and reprocessing.
    """
    import pyspark.sql.functions as F

    if len(ratio_ppm) == 0:
        raise ValueError("ratio_ppm table must be non-empty")
    buckets = len(ratio_ppm)
    rat = F.array(*[F.lit(int(r)) for r in ratio_ppm])
    turns = stream_transcripts(spark, input_path, max_files_per_trigger)
    canon = F.trim(
        F.regexp_replace(F.lower(F.coalesce(F.col("text"), F.lit(""))),
                         r"[ \t\r\n]+", " ")
    )
    t = turns.select(
        "conv_id", "turn_idx", "ts",
        F.when(F.length(canon) == 0, F.expr("array()"))
        .otherwise(F.split(canon, " "))
        .alias("ws"),
    ).withColumn("rat", rat)
    score = F.expr(
        "aggregate(filter(ws, w -> w != ''),"
        " 0L,"
        f" (a, w) -> a + element_at(rat, cast(cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint) % {buckets} + 1 as int)))"
    )
    n_words = F.expr("size(filter(ws, w -> w != ''))").cast("long")
    keyed = t.select(
        "conv_id", "turn_idx", "ts",
        n_words.alias("n_words"),
        score.alias("score_fp"),
    ).withColumn(
        "avg_ppm",
        F.expr("case when n_words > 0 then score_fp div n_words else 0 end"),
    )
    gate = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long") % F.lit(1000000)
    )
    scored = keyed.withColumn(
        "kept", gate < F.least(F.col("avg_ppm"), F.lit(1000000))
    )
    writer = (
        scored.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
