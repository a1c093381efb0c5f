"""Per-turn equality on a fixture seed the other tests never use —
guards against the suite silently overfitting to the seed=7 fixture."""

import pandas as pd
from pyspark.sql import functions as F

from cheque_ocr_project_spark.oracle import fuzzy
from cheque_ocr_project_spark.oracle import turn as ot
from cheque_ocr_project_spark.plans import pipeline as P
from cheque_ocr_project_spark.sources import synth


def test_arrow_engine_on_alternate_seed(spark):
    t = synth.generate_transcripts(n_convs=30, seed=424242, outlier_turns=150)
    dd = fuzzy.build_drawer_dict(
        synth.generate_master(seed=424242).drawer_nm.tolist()
    )
    sdf = spark.createDataFrame(t).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    )
    out = (
        P.extract_pipeline(spark, sdf, dd)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp_rows = []
    for r in t.itertuples():
        rec = ot.extract_turn(r.text, r.role, r.tool, dd)
        rec["conv_id"], rec["turn_idx"] = r.conv_id, r.turn_idx
        exp_rows.append(rec)
    exp = (
        pd.DataFrame(exp_rows)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(out) == len(exp)
    for col in ["main_text", "payee_cleaned", "issuer", "cheque_type",
                "status", "field_amount", "field_date", "micr_city"]:
        mism = [
            i for i, (a, b) in enumerate(zip(out[col], exp[col]))
            if not ((pd.isna(a) and (b is None or pd.isna(b))) or a == b)
        ]
        assert not mism, f"{col}: {len(mism)} mismatches at seed 424242"
    assert (out["issuer_conf"] - exp["issuer_conf"]).abs().max() == 0.0
