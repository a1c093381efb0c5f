"""V3-variant extraction: Spark UDF path == pure-Python oracle per turn."""

import pandas as pd

from cheque_ocr_project_spark.operators import extract as X
from cheque_ocr_project_spark.oracle import turn as ot


def test_v3_pipeline_matches_oracle(spark, transcripts_sdf, fixture_data):
    transcripts, _m, dd = fixture_data
    out = (
        X.extract_turns_v3_udf(spark, transcripts_sdf, dd)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    expected_rows = []
    for r in transcripts.itertuples():
        rec = ot.extract_turn_v3(r.text, r.role, r.tool, dd)
        rec["conv_id"] = r.conv_id
        rec["turn_idx"] = r.turn_idx
        expected_rows.append(rec)
    expected = (
        pd.DataFrame(expected_rows)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    for col in ["issuer_v3", "matched_with", "status_v3"]:
        mism = [
            i for i, (a, b) in enumerate(zip(out[col], expected[col]))
            if not ((pd.isna(a) and pd.isna(b)) or a == b)
        ]
        assert not mism, (
            f"{col}: {len(mism)} mismatches, first: "
            f"{out.iloc[mism[0]][['conv_id', 'turn_idx', col]].tolist()} vs "
            f"{expected.iloc[mism[0]][col]!r}"
        )
    assert (out["confidence_v3"] - expected["confidence_v3"]).abs().max() < 1e-12


def test_v3_statuses_cover_cascade(spark, transcripts_sdf, fixture_data):
    _t, _m, dd = fixture_data
    out = X.extract_turns_v3_udf(spark, transcripts_sdf, dd)
    statuses = {r[0] for r in out.select("status_v3").distinct().collect()}
    assert "AUTO-UPDATED" in statuses
    assert "NO-TEXT" in statuses
