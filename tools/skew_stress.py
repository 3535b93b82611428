"""Skewed-input stress drive: one 100k-turn hot conversation through the
full distributed pipeline at local[32].

Exercises the slice-salting skew path end-to-end (the unit tests cover it
at small widths): asserts the hot conversation fans out across multiple
salt slices and partitions, that every turn survives with the correct
payload extraction, and that per-conversation ordering is restorable from
turn_idx.  Run standalone (prints SKEW-STRESS-OK) or via
tests/test_skew_stress.py, which drives it in a subprocess because the
pytest session holds a local[4] SparkContext and a process allows only
one.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_TURNS = 100_000
N_COLD = 50
SLICE = 8_192  # default SALT_SLICE_TURNS


def build_fixture() -> pd.DataFrame:
    """One hot conversation (HOT_TURNS turns) + N_COLD 4-turn ones."""
    payload = (
        "Alpha beta gamma delta epsilon zeta. "
        "The quick brown fox jumps over the lazy dog again and again."
    )
    hot = pd.DataFrame(
        {
            "conv_id": "conv-hot",
            "turn_idx": np.arange(HOT_TURNS, dtype=np.int32),
            "role": "user",
            "text": payload,
            "tool": "",
            "ts": pd.Timestamp("2024-01-01"),
        }
    )
    cold = pd.DataFrame(
        {
            "conv_id": [f"conv-cold-{c:03d}" for c in range(N_COLD) for _ in range(4)],
            "turn_idx": np.tile(np.arange(4, dtype=np.int32), N_COLD),
            "role": "assistant",
            "text": payload,
            "tool": "",
            "ts": pd.Timestamp("2024-01-01"),
        }
    )
    return pd.concat([hot, cold], ignore_index=True)


def main() -> None:
    import pyspark.sql.functions as F

    from ocr_spark.extract import extract_frame
    from ocr_spark.plans.extract_job import plan_extract, with_bucket, with_slice_salt
    from ocr_spark.plans.session import build_session
    from ocr_spark.sources.transcripts import transcripts_from_pandas

    spark = build_session("skew-stress", master="local[32]", shuffle_partitions=32)
    pdf = build_fixture()
    sdf = transcripts_from_pandas(spark, pdf)

    # 1. the hot conversation fans out across ceil(HOT_TURNS/SLICE) salts
    salted = with_slice_salt(with_bucket(sdf, 64))
    hot_salts = (
        salted.filter(F.col("conv_id") == "conv-hot")
        .select("salt").distinct().count()
    )
    expect_slices = -(-HOT_TURNS // SLICE)
    assert hot_salts == expect_slices, (hot_salts, expect_slices)
    cold_salts = (
        salted.filter(F.col("conv_id") != "conv-hot")
        .select("salt").distinct().collect()
    )
    assert [r["salt"] for r in cold_salts] == [0], cold_salts

    # 2. the hot slices actually land on multiple partitions
    out = plan_extract(sdf, n_buckets=64)
    parts = (
        out.filter(F.col("conv_id") == "conv-hot")
        .select(F.spark_partition_id().alias("pid"))
        .distinct().count()
    )
    assert parts > 1, f"hot conversation stayed on {parts} partition"

    # 3. end-to-end: all rows survive, ordering restorable, bytes correct
    res = out.select("conv_id", "turn_idx", "extracted_text", "status").toPandas()
    assert len(res) == len(pdf), (len(res), len(pdf))
    hot_res = res[res.conv_id == "conv-hot"].sort_values("turn_idx")
    assert hot_res.turn_idx.tolist() == list(range(HOT_TURNS))
    assert (hot_res.status == "ok").all()
    expected_text = extract_frame(pdf.head(1)).extracted_text.iloc[0]
    assert (res.extracted_text == expected_text).all()

    spark.stop()
    print("SKEW-STRESS-OK")


if __name__ == "__main__":
    main()
