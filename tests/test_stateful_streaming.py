"""applyInPandasWithState: per-conversation running state across batches."""

from pyspark.sql import functions as F

from cheque_ocr_project_spark.streaming import stateful as SS
from cheque_ocr_project_spark.streaming import stream as ST


def test_conversation_progress_accumulates(spark, fixture_data, tmp_path):
    transcripts, _m, _dd = fixture_data
    convs = sorted(transcripts.conv_id.unique())[:6]
    subset = transcripts[transcripts.conv_id.isin(convs)]

    input_dir = tmp_path / "in"
    input_dir.mkdir()
    sdf = spark.createDataFrame(subset).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    )
    sdf.write.mode("append").parquet(str(input_dir))

    stream = ST.read_transcript_stream(spark, str(input_dir))
    out = SS.conversation_progress(stream, idle_timeout_ms=2000)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("conv_progress_t")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM conv_progress_t").collect()
    # update mode: memory sink keeps every emission; the last row per conv is
    # the idle-timeout "conversation closed" finalization
    latest = {}
    for r in rows:
        latest[r.conv_id] = r

    expected = subset.groupby("conv_id").agg(
        turns=("turn_idx", "size"), max_idx=("turn_idx", "max")
    )
    for conv in convs:
        r = latest[conv]
        assert r.turns_seen == int(expected.loc[conv, "turns"])
        assert r.max_turn_idx == int(expected.loc[conv, "max_idx"])
    # at least the running (non-closed) emission happened for every conv
    open_rows = {r.conv_id for r in rows if not r.closed}
    assert open_rows == set(convs)
    # marker counting is plausible (some cheque-like turns carry PAY/ORDER OF)
    assert sum(r.payee_marker_turns for r in latest.values()) > 0
