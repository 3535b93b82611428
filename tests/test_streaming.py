"""Structured Streaming extraction (ocr_spark/streaming/): the streaming
query must produce byte-identical results to the batch oracle, and the
checkpoint must make file delivery exactly-once across restarts."""

import pandas as pd
import pytest

from fixtures.gen import gen_transcripts
from ocr_spark.extract import extract_frame
from ocr_spark.sources.transcripts import transcripts_from_pandas
from ocr_spark.streaming import run_extract_stream


def _write_batch(spark, pdf, path):
    transcripts_from_pandas(spark, pdf).coalesce(1).write.mode("append").parquet(path)


def _drain(spark, inp, outp, ckpt):
    q = run_extract_stream(spark, inp, outp, ckpt, available_now=True)
    q.awaitTermination(120)
    assert not q.isActive


@pytest.fixture()
def dirs(tmp_path):
    return (str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt"))


def test_stream_matches_oracle(spark, dirs):
    inp, outp, ckpt = dirs
    pdf = gen_transcripts(n_convs=40)
    _write_batch(spark, pdf, inp)
    _drain(spark, inp, outp, ckpt)

    got = (
        spark.read.parquet(outp)
        .select("conv_id", "turn_idx", "extracted_text", "status")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        extract_frame(pdf)[["conv_id", "turn_idx", "extracted_text", "status"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want["turn_idx"] = want["turn_idx"].astype(got["turn_idx"].dtype)
    pd.testing.assert_frame_equal(got, want)


def test_stream_checkpoint_exactly_once(spark, dirs):
    inp, outp, ckpt = dirs
    first = gen_transcripts(n_convs=20)
    _write_batch(spark, first, inp)
    _drain(spark, inp, outp, ckpt)
    n1 = spark.read.parquet(outp).count()
    assert n1 == len(first)

    # restart with the same checkpoint: already-seen files are NOT
    # reprocessed, newly arrived files are
    second = gen_transcripts(n_convs=10, seed=123)
    second["conv_id"] = "second-" + second["conv_id"]
    _write_batch(spark, second, inp)
    _drain(spark, inp, outp, ckpt)
    out = spark.read.parquet(outp)
    assert out.count() == len(first) + len(second)
    assert out.filter(out.conv_id.startswith("second-")).count() == len(second)
