"""Structured Streaming extraction: incremental processing + exactly-once
resume (the Spark-native replacement for the reference's batch chunking +
dedup set, SURVEY.md §2.10)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cheque_ocr_project_spark.streaming import stream as ST


@pytest.fixture()
def staged_input(spark, fixture_data, tmp_path):
    transcripts, _m, dd = fixture_data
    convs = sorted(transcripts.conv_id.unique())
    half1 = transcripts[transcripts.conv_id.isin(convs[:10])]
    half2 = transcripts[transcripts.conv_id.isin(convs[10:20])]
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    sdf1 = spark.createDataFrame(half1).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    )
    sdf1.write.mode("append").parquet(str(input_dir))
    return input_dir, half1, half2, dd


def test_stream_extract_incremental(spark, staged_input, tmp_path):
    input_dir, half1, half2, dd = staged_input
    out_dir = str(tmp_path / "out")
    cp_dir = str(tmp_path / "cp")

    q = ST.stream_extract(spark, str(input_dir), out_dir, cp_dir, dd)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == len(half1)

    # drop in the second batch of files; restart drains ONLY the new ones
    sdf2 = spark.createDataFrame(half2).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    )
    sdf2.write.mode("append").parquet(str(input_dir))

    q2 = ST.stream_extract(spark, str(input_dir), out_dir, cp_dir, dd)
    q2.awaitTermination(120)
    result = spark.read.parquet(out_dir)
    assert result.count() == len(half1) + len(half2)
    # exactly-once: no duplicated keys despite the append sink
    assert result.select("conv_id", "turn_idx").distinct().count() == result.count()

    # restart with nothing new: no growth
    q3 = ST.stream_extract(spark, str(input_dir), out_dir, cp_dir, dd)
    q3.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == len(half1) + len(half2)


def test_stream_status_counts_and_rate(spark, staged_input, tmp_path):
    input_dir, half1, _half2, dd = staged_input
    out_dir = str(tmp_path / "out")
    q = ST.stream_extract(spark, str(input_dir), out_dir, str(tmp_path / "cp1"), dd)
    q.awaitTermination(120)

    qc = ST.stream_status_counts(
        spark, out_dir, str(tmp_path / "cp2"), "status_counts_t"
    )
    qc.awaitTermination(120)
    counts = spark.sql("SELECT * FROM status_counts_t").toPandas()
    assert counts["count"].sum() == len(half1)
    assert set(counts.status) <= {"AUTO-UPDATED", "REJECTED", "ERROR"}

    qr = ST.stream_turn_rate(
        spark, str(input_dir), str(tmp_path / "cp3"), "turn_rate_t"
    )
    qr.awaitTermination(120)
    rate = spark.sql("SELECT * FROM turn_rate_t").toPandas()
    assert rate.turns.sum() > 0


def test_stream_replay_is_idempotent(spark, staged_input, tmp_path):
    """foreachBatch is at-least-once: wiping the streaming checkpoint forces
    a full replay — the batch_id-partitioned dynamic-overwrite sink must
    REPLACE, not duplicate (ADVICE round-1 #2)."""
    import shutil

    input_dir, half1, _half2, dd = staged_input
    out_dir = str(tmp_path / "out_replay")
    cp_dir = str(tmp_path / "cp_replay")

    q = ST.stream_extract(spark, str(input_dir), out_dir, cp_dir, dd)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == len(half1)

    shutil.rmtree(cp_dir)  # lose the checkpoint -> everything replays
    q2 = ST.stream_extract(spark, str(input_dir), out_dir, cp_dir, dd)
    q2.awaitTermination(120)
    result = spark.read.parquet(out_dir)
    assert result.count() == n1  # replaced, not appended
    assert result.select("conv_id", "turn_idx").distinct().count() == n1
