"""S9 JSON detail sink + S10 summary TXT renderer."""

import json

from pyspark.sql import functions as F

from cheque_ocr_project_spark.plans import pipeline as P
from cheque_ocr_project_spark.sources import sinks


def _results(spark, fixture_data, transcripts_sdf):
    _t, _m, drawer_dict = fixture_data
    return P.extract_pipeline(spark, transcripts_sdf, drawer_dict)


def test_json_detail_sink(spark, fixture_data, transcripts_sdf, tmp_path):
    results = _results(spark, fixture_data, transcripts_sdf)
    out = str(tmp_path / "detail_json")
    sinks.write_json_detail(results, out)
    back = spark.read.json(out)
    assert back.count() == results.count()
    rec = json.loads(
        spark.sparkContext.textFile(out).first()
    )
    for field in ("conv_id", "turn_idx", "payee_cleaned", "issuer", "status"):
        assert field in rec


def test_summary_txt_renderer(spark, fixture_data, transcripts_sdf, tmp_path):
    results = _results(spark, fixture_data, transcripts_sdf).cache()
    path = tmp_path / "summary.txt"
    text = sinks.write_summary_txt(results, str(path), wall_seconds=2.0)
    assert path.read_text() == text

    total = results.count()
    ok = results.filter(F.col("success")).count()
    n_auto = results.filter(F.col("status") == "AUTO-UPDATED").count()
    assert f"Total turns processed : {total}" in text
    assert f"Successful            : {ok}" in text
    if n_auto:
        assert f"AUTO-UPDATED         {n_auto}" in text
    assert "Throughput" in text
    results.unpersist()
