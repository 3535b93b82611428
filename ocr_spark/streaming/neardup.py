"""Streaming MinHash near-dup — the continuous twin of the batch
MinHash+LSH pipeline (P3, `__spark_entry__._q_minhash_lsh`).

Stage map (batch -> stream):
  - shingle fingerprints + K=8 affine min-hash signature + 4x2 banding:
    identical STATELESS expressions (array functions instead of the
    batch explode+groupBy — same values per doc, no shuffle needed
    before the stateful stage);
  - the band-bucket self-JOIN becomes `applyInPandasWithState` keyed on
    (band, mh0, mh1): the state cell holds the docs previously seen in
    that bucket (doc_id + shingle multiset); each arriving doc is
    exact-Jaccard-verified against them and qualifying pairs
    (>= 0.5, fixed-point) are emitted immediately.

Semantics: the emitted pair SET equals the batch query's over the same
bounded input, independent of arrival order — every co-bucketed pair is
compared exactly once (later arrival vs. state, or in-batch vs. earlier
in the same micro-batch), re-delivered doc_ids are skipped
idempotently, and the exact-Jaccard arithmetic mirrors the batch floor/
float formulation op for op.  A pair sharing MULTIPLE bands emits once
per matching band (at-least-once per pair); consumers key on
(doc_a, doc_b) — deduplicating inside the query would chain a second
stateful operator for no semantic gain.

State bound: EventTimeTimeout evicts a bucket's state once the
watermark passes its last arrival + the dedup horizon, so state is
(horizon x arrival rate x shingles/doc), not stream length — the same
bounding contract as run_dedup_stream.  Near-dups separated by more
than the horizon are owned by the batch pass, as with exact dedup.
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# cross-engine MinHash constants — MUST mirror __spark_entry__ (cited
# there; duplicated because ocr_spark.zip ships without the repo root)
_M31 = 2_147_483_647
_MINHASH_A = [2, 3, 5, 7, 11, 13, 17, 19]
_MINHASH_B = [1, 2, 3, 4, 5, 6, 7, 8]
_JACCARD_FP_MIN = 500_000

DOCS_STREAM_SCHEMA = "doc_id long, text string, ts timestamp"
PAIR_SCHEMA = "doc_a long, doc_b long, jaccard_fp long"
_STATE_SCHEMA = (
    "doc_ids array<long>, shingle_sets array<array<long>>, last_ms long"
)

_HORIZON_MS = 60 * 60 * 1000  # state eviction horizon (1 hour)


def stream_documents(
    spark: SparkSession, input_path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(DOCS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_path)


def with_band_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, ts, shingles, band, mh0, mh1) x 4 bands per doc — the
    stateless signature stage.  Documents with no 3-gram shingle are
    dropped, as in batch (they have no signature rows there either)."""
    words = docs.select("doc_id", "ts", F.split("text", " ").alias("w"))
    sh_strs = F.expr(
        "array_distinct(transform(sequence(1, greatest(size(w) - 2, 0)),"
        " i -> concat_ws(' ', element_at(w, i),"
        " element_at(w, i+1), element_at(w, i+2))))"
    )
    fps = F.transform(
        sh_strs,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % F.lit(_M31),
    )
    d = words.select("doc_id", "ts", fps.alias("shingles")).filter(
        F.size("shingles") > 0
    )
    mh = [
        F.array_min(
            F.transform(
                "shingles",
                lambda x: (F.lit(_MINHASH_A[k]) * x + F.lit(_MINHASH_B[k]))
                % F.lit(_M31),
            )
        ).alias(f"mh{k}")
        for k in range(8)
    ]
    sig = d.select("doc_id", "ts", "shingles", *mh)
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.col(f"mh{2 * j}").alias("mh0"),
                F.col(f"mh{2 * j + 1}").alias("mh1"),
            )
            for j in range(4)
        ]
    )
    return sig.select(
        "doc_id", "ts", "shingles", F.explode(bands).alias("b")
    ).select("doc_id", "ts", "shingles", "b.band", "b.mh0", "b.mh1")


def _jaccard_fp(ca: Counter, na: int, cb: Counter, nb: int) -> int:
    # mirrors the batch join arithmetic exactly: shared counts matching
    # fingerprint ROW pairs (multiplicity product — collisions of two
    # distinct shingles onto one fp are astronomically rare but the
    # batch join would count them this way), float64 scale + floor
    shared = sum(cnt * cb[v] for v, cnt in ca.items() if v in cb)
    if shared == 0:
        return 0
    return int(math.floor(shared * 1000000.0 / (na + nb - shared)))


def _bucket_pairs(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        doc_ids, shingle_sets, last_ms = state.get
        doc_ids = [int(x) for x in doc_ids]
        shingle_sets = [[int(x) for x in s] for s in shingle_sets]
        last_ms = int(last_ms)
    else:
        doc_ids, shingle_sets, last_ms = [], [], 0
    counters = [Counter(s) for s in shingle_sets]
    known = set(doc_ids)
    out_a, out_b, out_j = [], [], []
    arrivals: list[tuple[int, list, pd.Timestamp]] = []
    for pdf in pdfs:
        for doc_id, sh, ts in zip(pdf["doc_id"], pdf["shingles"], pdf["ts"]):
            # plain Python ints: the state round-trips through the JVM
            # pickler, which rejects numpy scalar types
            arrivals.append((int(doc_id), [int(x) for x in sh], ts))
    # deterministic intra-batch order (the pair set is order-independent,
    # but a stable order keeps re-runs byte-identical)
    arrivals.sort(key=lambda t: t[0])
    for doc_id, sh, ts in arrivals:
        if doc_id in known:  # idempotent re-delivery
            continue
        ca = Counter(sh)
        na = len(sh)
        for other_id, other_sh, cb in zip(doc_ids, shingle_sets, counters):
            j = _jaccard_fp(ca, na, cb, len(other_sh))
            if j >= _JACCARD_FP_MIN:
                out_a.append(min(doc_id, other_id))
                out_b.append(max(doc_id, other_id))
                out_j.append(j)
        doc_ids.append(doc_id)
        shingle_sets.append(sh)
        counters.append(ca)
        known.add(doc_id)
        last_ms = max(last_ms, int(ts.timestamp() * 1000))
    state.update((doc_ids, shingle_sets, last_ms))
    state.setTimeoutTimestamp(last_ms + _HORIZON_MS)
    if out_a:
        yield pd.DataFrame(
            {"doc_a": out_a, "doc_b": out_b, "jaccard_fp": out_j}
        )


def run_minhash_neardup_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = False,
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start the streaming near-dup query over a (doc_id, text, ts)
    document stream; emits exact-verified pairs (doc_a, doc_b,
    jaccard_fp), at-least-once per shared band (see module docstring)."""
    docs = stream_documents(spark, input_path, max_files_per_trigger)
    banded = with_band_rows(docs).withWatermark("ts", watermark)
    pairs = banded.groupBy("band", "mh0", "mh1").applyInPandasWithState(
        _bucket_pairs,
        outputStructType=PAIR_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    writer = (
        pairs.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
