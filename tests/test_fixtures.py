"""Fixture-generator tests: determinism, schema, skew, shuffled order."""

import numpy as np
import pandas as pd

from fixtures.gen import gen_transcripts


def test_deterministic():
    a = gen_transcripts(n_convs=10, seed=7)
    b = gen_transcripts(n_convs=10, seed=7)
    pd.testing.assert_frame_equal(a, b)


def test_schema():
    df = gen_transcripts(n_convs=5)
    assert list(df.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert df["turn_idx"].dtype == np.dtype("int32")
    assert df["ts"].dtype.kind == "M"
    assert (df.loc[df["role"] != "tool", "tool"] == "").all()


def test_turn_idx_contiguous_per_conv():
    df = gen_transcripts(n_convs=10)
    for _, g in df.groupby("conv_id"):
        idx = sorted(g["turn_idx"].tolist())
        assert idx == list(range(len(idx)))


def test_shuffled_emission():
    df = gen_transcripts(n_convs=20)
    ordered = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert not df.equals(ordered)


def test_hot_conversation():
    df = gen_transcripts(n_convs=5, hot_conv_turns=200)
    counts = df.groupby("conv_id").size()
    assert counts["conv-000000"] == 200


def test_pandas_twin_matches_spark_derivation(spark):
    """derive_transcripts_pandas must stay byte-identical to the Spark
    derivation — it backs the expected-output oracles (gen_expected.py)
    and the bench hardware ceiling.  Any payload-template edit must land
    in both or this fails."""
    import os

    import pytest as _pytest

    from ocr_spark.sources.transcripts import (
        derive_transcripts_from_documents,
        derive_transcripts_pandas,
    )

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        _pytest.skip("driver testdata not present")
    sd = (
        derive_transcripts_from_documents(spark, sf)
        .select("conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pdf = (
        derive_transcripts_pandas(sf)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(sd) == len(pdf)
    assert (sd.conv_id == pdf.conv_id).all()
    assert (sd.turn_idx.astype("int64") == pdf.turn_idx.astype("int64")).all()
    assert (sd.text == pdf.text).all()
