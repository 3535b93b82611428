"""M2/M3 distributed-correctness tests (SURVEY.md §5.2.1/.3):

  - oracle parity: mapInPandas output byte-equals the single-process
    pandas oracle per (conv_id, turn_idx) — THE north_rule invariant;
  - parity is partitioning-invariant (forced salting, few/many
    partitions);
  - resume: second run with lineage present skips completed buckets;
  - idempotence: re-running a bucket leaves output unchanged.
"""

import pandas as pd
import pyspark.sql.functions as F
import pytest

from fixtures.gen import gen_transcripts
from ocr_spark.extract import extract_frame
from ocr_spark.plans.extract_job import (
    detect_hot_buckets,
    plan_extract,
    run_extract,
    stable_order,
    with_bucket,
    with_salt,
    with_slice_salt,
)
from ocr_spark.sources.transcripts import transcripts_from_pandas


def _oracle(pdf: pd.DataFrame) -> pd.DataFrame:
    out = extract_frame(pdf)
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _spark_result(sdf) -> pd.DataFrame:
    pdf = sdf.drop("bucket").toPandas()
    return pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _assert_parity(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame):
    assert len(spark_pdf) == len(oracle_pdf)
    assert list(spark_pdf["conv_id"]) == list(oracle_pdf["conv_id"])
    assert list(spark_pdf["turn_idx"]) == list(oracle_pdf["turn_idx"])
    # the invariant: byte-exact text per turn
    assert list(spark_pdf["extracted_text"]) == list(oracle_pdf["extracted_text"])
    assert list(spark_pdf["status"]) == list(oracle_pdf["status"])
    # span arrays equal (mapInPandas returns struct Rows -> normalize)
    for a, b in zip(spark_pdf["spans"], oracle_pdf["spans"]):
        na = [tuple(x) if not isinstance(x, dict) else (x["start"], x["end"], x["score"], x["position"]) for x in a]
        nb = [(x["start"], x["end"], x["score"], x["position"]) for x in b]
        assert na == nb


@pytest.fixture(scope="module")
def fixture_pdf():
    return gen_transcripts(n_convs=60, seed=11)


def test_oracle_parity(spark, fixture_pdf):
    sdf = transcripts_from_pandas(spark, fixture_pdf)
    result = _spark_result(plan_extract(sdf, n_buckets=16))
    _assert_parity(result, _oracle(fixture_pdf))


def test_parity_partitioning_invariant(spark, fixture_pdf):
    sdf = transcripts_from_pandas(spark, fixture_pdf)
    few = _spark_result(plan_extract(sdf, n_buckets=2, num_partitions=1))
    many = _spark_result(plan_extract(sdf, n_buckets=64, num_partitions=32))
    _assert_parity(few, _oracle(fixture_pdf))
    _assert_parity(many, _oracle(fixture_pdf))


def test_parity_with_forced_salting(spark):
    """Slice salting fans a hot conversation out across salts with zero
    pre-scan, and parity holds with the fan-out forced on."""
    pdf = gen_transcripts(n_convs=6, seed=3, hot_conv_turns=2000)
    sdf = with_bucket(transcripts_from_pandas(spark, pdf), 8)
    salted = with_slice_salt(sdf, slice_turns=256)
    n_salts = salted.select("salt").distinct().count()
    assert n_salts > 1, "hot conversation must actually fan out"
    # short conversations keep salt 0 (stay whole in their bucket)
    short = salted.filter(F.col("turn_idx") < 256).select("salt").distinct()
    assert [r["salt"] for r in short.collect()] == [0]
    result = _spark_result(
        plan_extract(
            transcripts_from_pandas(spark, pdf), n_buckets=8, slice_turns=256
        )
    )
    _assert_parity(result, _oracle(pdf))


def test_detect_hot_buckets_diagnostic(spark):
    """The legacy detect+salt probe (off the hot path) still works, with
    and without sampling."""
    pdf = gen_transcripts(n_convs=6, seed=3, hot_conv_turns=2000)
    sdf = with_bucket(transcripts_from_pandas(spark, pdf), 8)
    hot = detect_hot_buckets(sdf)
    assert hot, "fixture must produce a hot bucket"
    # 50% sample keeps the relative bucket weights -> same hot set
    hot_sampled = detect_hot_buckets(sdf, sample_fraction=0.5)
    assert set(hot_sampled) == set(hot)
    salted = with_salt(sdf, hot)
    assert salted.select("salt").distinct().count() > 1


def test_plan_extract_no_prescan(spark, fixture_pdf, tmp_path):
    """The flagship plan scans its input ONCE and planning triggers no
    jobs (the round-1 hot-bucket pre-pass cost a full extra scan)."""
    p = str(tmp_path / "transcripts")
    transcripts_from_pandas(spark, fixture_pdf).write.parquet(p)
    inp = spark.read.parquet(p)

    sc = spark.sparkContext
    sc.setJobGroup("plan-probe", "planning must not run jobs")
    try:
        out = plan_extract(inp, n_buckets=8)
        # building the plan (incl. analysis) must not submit any job
        assert sc.statusTracker().getJobIdsForGroup("plan-probe") == []
    finally:
        sc.setJobGroup(None, None)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_stable_order_window(spark, fixture_pdf):
    sdf = transcripts_from_pandas(spark, fixture_pdf)
    out = stable_order(plan_extract(sdf, n_buckets=8))
    pdf = out.toPandas().sort_values(["conv_id", "turn_idx"])
    for _, g in pdf.groupby("conv_id"):
        assert list(g["turn_rank"]) == list(range(1, len(g) + 1))


def test_run_extract_and_resume(spark, fixture_pdf, tmp_path):
    sdf = transcripts_from_pandas(spark, fixture_pdf)
    out_p, lin_p = str(tmp_path / "out"), str(tmp_path / "lineage")

    stats1 = run_extract(spark, sdf, out_p, lin_p, run_id="r1", n_buckets=8)
    assert stats1["buckets_skipped"] == 0
    first = spark.read.parquet(out_p)
    assert first.count() == len(fixture_pdf)

    lin = spark.read.parquet(lin_p)
    assert lin.filter(F.col("run_id") == "r1").count() > 0
    total = lin.agg(F.sum("rows_out")).collect()[0][0]
    assert total == len(fixture_pdf)

    # resume: every bucket done -> all skipped, output unchanged
    stats2 = run_extract(
        spark, sdf, out_p, lin_p, run_id="r1", n_buckets=8, resume=True
    )
    assert stats2["buckets_skipped"] == lin.select("bucket").distinct().count()
    second = spark.read.parquet(out_p)
    _assert_parity(
        _spark_result(second.select(first.columns)),
        _oracle(fixture_pdf),
    )


def test_resume_partial(spark, fixture_pdf, tmp_path):
    """Kill half the buckets from lineage -> only those rerun."""
    sdf = transcripts_from_pandas(spark, fixture_pdf)
    out_p, lin_p = str(tmp_path / "out"), str(tmp_path / "lineage")
    run_extract(spark, sdf, out_p, lin_p, run_id="r2", n_buckets=8)

    lin = spark.read.parquet(lin_p).filter(F.col("run_id") == "r2")
    buckets = sorted(r["bucket"] for r in lin.select("bucket").distinct().collect())
    half = buckets[: len(buckets) // 2]
    # rewrite lineage keeping only half the completed buckets
    kept_pdf = lin.filter(F.col("bucket").isin(half)).toPandas()
    import os

    lin2 = str(tmp_path / "lineage2")
    os.makedirs(lin2, exist_ok=True)
    kept_pdf.to_parquet(os.path.join(lin2, "part-0.parquet"))

    stats = run_extract(
        spark, sdf, out_p, lin2, run_id="r2", n_buckets=8, resume=True
    )
    assert stats["buckets_skipped"] == len(half)
    # full output still complete + correct after the partial rerun
    final = spark.read.parquet(out_p)
    assert final.count() == len(fixture_pdf)


def test_no_per_row_python_udf():
    """input_hint mandate: no row-at-a-time @udf in the engine source."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "ocr_spark"
    for f in root.rglob("*.py"):
        src = f.read_text()
        assert "@F.udf" not in src and "@udf" not in src, f


def test_oversize_payload_distributed(spark):
    """F2 guard at the distributed surface: a 2MB payload and a
    >MAX_TURN_CHARS payload pass through without job failure, and results
    match the oracle byte-for-byte."""
    big = "lorem ipsum words " * 120000            # ~2.1 MB
    huge = "z" * (17 * 1024 * 1024)                # > 16 MiB cap -> truncated
    pdf = pd.DataFrame(
        {
            "conv_id": ["big", "huge", "tiny"],
            "turn_idx": [0, 0, 0],
            "role": ["user"] * 3,
            "text": [big, huge, "short but real content words here"],
            "tool": [""] * 3,
            "ts": [pd.Timestamp("2024-01-01")] * 3,
        }
    )
    result = _spark_result(plan_extract(transcripts_from_pandas(spark, pdf), n_buckets=4))
    _assert_parity(result, _oracle(pdf))
