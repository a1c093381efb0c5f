"""Checkpoint manifest + idempotent resume (north rule B5) and keyed merge."""

import json
from pathlib import Path

from pyspark.sql import functions as F

from cheque_ocr_project_spark.sources import checkpoint as CP
from cheque_ocr_project_spark.sources import io as IO


def test_resume_skips_completed_buckets(spark, transcripts_sdf, fixture_data, tmp_path):
    _t, _m, dd = fixture_data
    out = str(tmp_path / "out")
    n_buckets = 8

    # full run
    stats1 = CP.run_with_checkpoint(spark, transcripts_sdf, dd, out, n_buckets)
    assert stats1["processed_buckets"] == n_buckets
    full = spark.read.parquet(f"{out}/data")
    n_all = full.count()
    assert n_all == transcripts_sdf.count()

    # resume over the same input: nothing to do
    stats2 = CP.run_with_checkpoint(spark, transcripts_sdf, dd, out, n_buckets)
    assert stats2["processed_buckets"] == 0
    assert stats2["skipped_buckets"] == n_buckets

    # simulate a crash between data commit and manifest append: drop the
    # manifest entries for 3 buckets, resume must reprocess exactly those
    manifest_dir = Path(out) / "_manifest"
    entries = CP.read_manifest(out)
    keep = [e for e in entries if e["bucket"] not in {0, 1, 2}]
    for f in manifest_dir.glob("*.json"):
        f.unlink()
    CP.append_manifest(out, keep)

    stats3 = CP.run_with_checkpoint(spark, transcripts_sdf, dd, out, n_buckets)
    assert stats3["processed_buckets"] == 3
    assert stats3["skipped_buckets"] == n_buckets - 3

    # idempotence: same row count, same content after the partial rerun
    again = spark.read.parquet(f"{out}/data")
    assert again.count() == n_all
    assert CP.completed_buckets(out) == set(range(n_buckets))

    # manifest metrics are sane
    for e in CP.read_manifest(out):
        assert e["rows"] > 0 and e["bytes"] > 0 and "input_fingerprint" in e


def test_manifest_metrics_cover_all_rows(spark, transcripts_sdf, fixture_data, tmp_path):
    _t, _m, dd = fixture_data
    out = str(tmp_path / "out2")
    CP.run_with_checkpoint(spark, transcripts_sdf, dd, out, n_buckets=4)
    total = sum(e["rows"] for e in CP.read_manifest(out))
    assert total == transcripts_sdf.count()


def test_zero_output_bucket_still_committed(spark, transcripts_sdf,
                                            fixture_data, tmp_path,
                                            monkeypatch):
    """A bucket whose extraction yields ZERO output rows must still get a
    manifest entry (rows=0), or resume re-processes it forever and
    processed_buckets overcounts."""
    from cheque_ocr_project_spark.plans import pipeline as P

    _t, _m, dd = fixture_data
    out = str(tmp_path / "out_zero")

    real = P.extract_pipeline

    def dropping_pipeline(spark_, df, *a, **kw):
        # emit nothing for any turn of conversations hashing into the test
        # slice — deterministic, bucket-aligned zero-output simulation
        return real(spark_, df, *a, **kw).filter(F.lit(False))

    monkeypatch.setattr(P, "extract_pipeline", dropping_pipeline)
    stats = CP.run_with_checkpoint(spark, transcripts_sdf, dd, out,
                                   n_buckets=4, wave_size=2)
    assert stats["processed_buckets"] == 4
    entries = CP.read_manifest(out)
    assert {e["bucket"] for e in entries} == set(range(4))
    assert all(e["rows"] == 0 and e["bytes"] == 0 for e in entries)
    assert all(e["input_rows"] > 0 for e in entries)

    # resume: every attempted bucket is committed — nothing left to do
    monkeypatch.setattr(P, "extract_pipeline", real)
    stats2 = CP.run_with_checkpoint(spark, transcripts_sdf, dd, out,
                                    n_buckets=4)
    assert stats2["processed_buckets"] == 0
    assert stats2["skipped_buckets"] == 4


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [("c1", 0, "OLD", "X"), ("c1", 1, "OLD", "X"), ("c2", 0, "OLD", "X")],
        "conv_id string, turn_idx int, drawer_nm string, opr_no string",
    )
    updates = spark.createDataFrame(
        [("c1", 1, "NEW NAME", "AS601"), ("c9", 9, "IGNORED", "AS601")],
        "conv_id string, turn_idx int, drawer_nm string, opr_no string",
    )
    merged = IO.merge_upsert(
        target, updates, ["conv_id", "turn_idx"], ["drawer_nm", "opr_no"]
    )
    rows = {(r.conv_id, r.turn_idx): (r.drawer_nm, r.opr_no) for r in merged.collect()}
    assert rows[("c1", 1)] == ("NEW NAME", "AS601")   # matched → updated
    assert rows[("c1", 0)] == ("OLD", "X")            # unmatched → unchanged
    assert ("c9", 9) not in rows                      # no insert semantics
    assert len(rows) == 3


def test_stem_key(spark):
    df = spark.createDataFrame(
        [("DIR/P_000123.TIF",), ("a\\b\\IMG.tiff",), ("plain",)], "f string"
    )
    got = [r[0] for r in df.select(IO.stem_key(F.col("f"))).collect()]
    assert got == ["p_000123", "img", "plain"]


def test_wave_commit_survives_driver_crash(spark, transcripts_sdf, fixture_data, tmp_path):
    """A driver crash between waves must lose at most the in-flight wave:
    the committed waves' buckets are skipped on resume (VERDICT round-1 #6)."""
    import pytest

    _t, _m, dd = fixture_data
    out = str(tmp_path / "out_wave")
    n_buckets = 8

    with pytest.raises(RuntimeError, match="simulated driver crash"):
        CP.run_with_checkpoint(
            spark, transcripts_sdf, dd, out, n_buckets,
            wave_size=3, _fail_after_waves=1,
        )
    committed = CP.completed_buckets(out)
    assert len(committed) == 3  # exactly the first wave

    # resume: processes only the remaining buckets, in waves
    stats = CP.run_with_checkpoint(
        spark, transcripts_sdf, dd, out, n_buckets, wave_size=3
    )
    assert stats["processed_buckets"] == n_buckets - 3
    assert stats["skipped_buckets"] == 3
    assert stats["waves"] == 2  # ceil(5/3)

    full = spark.read.parquet(f"{out}/data")
    assert full.count() == transcripts_sdf.count()
    assert full.select("conv_id", "turn_idx").distinct().count() == full.count()

    # per-wave honest wall_ms: entries carry their own wave's wall + index
    waves = {e["wave"] for e in CP.read_manifest(out)}
    assert waves == {0, 1}  # resume restarted wave numbering
    assert all(e["wall_ms"] > 0 for e in CP.read_manifest(out))


def test_read_transcripts_csv_and_json(spark, fixture_data, tmp_path):
    """S5: the manifest-CSV (and JSON-lines) side channels read back into
    the transcripts shape with restored types."""
    transcripts, _m, _dd = fixture_data
    sdf = spark.createDataFrame(transcripts.head(40)).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    )
    csv_dir = str(tmp_path / "in_csv")
    sdf.write.option("header", True).mode("overwrite").csv(csv_dir + "/part.csv")
    back = IO.read_transcripts(spark, csv_dir + "/part.csv")
    assert back.count() == 40
    assert dict(back.dtypes)["turn_idx"] == "int"

    json_dir = str(tmp_path / "in_json")
    sdf.write.mode("overwrite").json(json_dir + "/part.json")
    backj = IO.read_transcripts(spark, json_dir + "/part.json")
    assert backj.count() == 40

    orc_dir = str(tmp_path / "in_orc")
    sdf.write.mode("overwrite").orc(orc_dir + "/part.orc")
    backo = IO.read_transcripts(spark, orc_dir + "/part.orc")
    assert backo.count() == 40
    # ORC preserves the typed schema end-to-end (no cast restoration)
    assert dict(backo.dtypes)["turn_idx"] == "int"
    assert dict(backo.dtypes)["ts"] == "timestamp"


def test_job_refuses_silent_manifest_overwrite(tmp_path, monkeypatch):
    """A fresh run into an output with existing run state must fail without
    --overwrite (and must not delete it); --overwrite must discard ALL
    resume state — manifest, staged input + marker, and the data dir — so a
    fresh --stage-input run can never reuse a stale staged copy."""
    import pytest

    from cheque_ocr_project_spark import job

    out = tmp_path / "jobout"
    manifest = out / "_manifest"
    manifest.mkdir(parents=True)
    (manifest / "commit-1-1.json").write_text('{"bucket": 0, "rows": 1}\n')
    staged = out / "_staged"
    staged.mkdir()
    (staged / "bucket=0").mkdir()
    marker = out / "_staged.committed"
    marker.write_text("ok\n")
    data = out / "data"
    data.mkdir()
    (data / "bucket=7").mkdir()

    argv = ["--input", "/nonexistent", "--output", str(out)]
    # SparkSession would be built before the guard — stub it out
    import pyspark.sql as pq

    class _Boom:
        def __getattr__(self, name):
            raise AssertionError("must exit before touching Spark IO")

    monkeypatch.setattr(pq.SparkSession, "builder", _Boom(), raising=False)
    with pytest.raises(SystemExit, match="already has run state"):
        job.main(argv)
    assert manifest.exists() and staged.exists()  # nothing deleted
    assert marker.exists() and data.exists()

    # --overwrite deletes every piece of state and proceeds to (stubbed) Spark
    with pytest.raises(AssertionError, match="must exit before"):
        job.main(argv + ["--overwrite"])
    assert not manifest.exists() and not staged.exists()
    assert not marker.exists() and not data.exists()


def test_staged_input_waves(spark, transcripts_sdf, fixture_data, tmp_path):
    """stage_input=True: one bucket-partitioned staging write, waves read
    with partition pruning; results identical to the unstaged run."""
    from pathlib import Path

    _t, _m, dd = fixture_data
    out = str(tmp_path / "out_staged")
    stats = CP.run_with_checkpoint(
        spark, transcripts_sdf, dd, out, n_buckets=8, wave_size=3,
        stage_input=True,
    )
    assert stats["processed_buckets"] == 8 and stats["waves"] == 3
    assert Path(out + "/_staged.committed").exists()
    full = spark.read.parquet(f"{out}/data")
    assert full.count() == transcripts_sdf.count()
    assert full.select("conv_id", "turn_idx").distinct().count() == full.count()

    # resume reuses the staged copy and does nothing
    stats2 = CP.run_with_checkpoint(
        spark, transcripts_sdf, dd, out, n_buckets=8, stage_input=True
    )
    assert stats2["processed_buckets"] == 0
