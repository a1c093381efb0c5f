"""Per-turn equality: native Catalyst pipeline == oracle == UDF pipeline.

This is the graft's correctness gate (north rule: per-turn text equality
under stable (conv_id, turn_idx) ordering).
"""

import math

import pandas as pd
import pytest

from cheque_ocr_project_spark.operators import extract as X
from cheque_ocr_project_spark.plans import pipeline as P
from tests.conftest import oracle_frame

KEY = ["conv_id", "turn_idx"]
FLOAT_COLS = {"issuer_conf", "confidence"}


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(KEY).reset_index(drop=True)
    return df[sorted(df.columns)]


def _assert_frames_equal(actual: pd.DataFrame, expected: pd.DataFrame, tag: str):
    actual = _normalize(actual)
    expected = _normalize(expected)
    assert len(actual) == len(expected), f"{tag}: row count mismatch"
    mismatch_report = []
    for col in expected.columns:
        a, e = actual[col], expected[col]
        if col in FLOAT_COLS:
            bad = [
                i
                for i, (x, y) in enumerate(zip(a, e))
                if not (
                    (pd.isna(x) and pd.isna(y))
                    or (not pd.isna(x) and not pd.isna(y) and math.isclose(x, y, rel_tol=0, abs_tol=1e-12))
                )
            ]
        else:
            bad = [
                i
                for i, (x, y) in enumerate(zip(a, e))
                if not ((pd.isna(x) and pd.isna(y)) or x == y)
            ]
        if bad:
            i = bad[0]
            mismatch_report.append(
                f"{tag}: column {col}: {len(bad)} mismatches; first at "
                f"{expected.loc[i, 'conv_id']}/{expected.loc[i, 'turn_idx']}: "
                f"actual={actual.loc[i, col]!r} expected={expected.loc[i, col]!r}"
            )
    assert not mismatch_report, "\n".join(mismatch_report)


@pytest.fixture(scope="module")
def expected(fixture_data):
    transcripts, _master, drawer_dict = fixture_data
    return oracle_frame(transcripts, drawer_dict)


def test_native_pipeline_matches_oracle(spark, transcripts_sdf, fixture_data, expected):
    _t, _m, drawer_dict = fixture_data
    out = P.extract_pipeline(
        spark, transcripts_sdf, drawer_dict, engine="native"
    ).toPandas()
    _assert_frames_equal(out, expected, "native")


def test_vectorized_pipeline_matches_oracle(spark, transcripts_sdf, fixture_data, expected):
    """The pandas-Series-vectorized batch kernel (zero per-row Python; the
    measured-fastest 'arrow' engine is the default) must match the oracle
    per turn."""
    _t, _m, drawer_dict = fixture_data
    out = P.extract_pipeline(
        spark, transcripts_sdf, drawer_dict, engine="vectorized"
    ).toPandas()
    _assert_frames_equal(out, expected, "vectorized")


def test_hybrid_pipeline_matches_oracle(spark, transcripts_sdf, fixture_data, expected):
    """The barrier-staged native + Arrow-fuzzy-join engine (the fast
    non-Python path) must match the oracle per turn."""
    _t, _m, drawer_dict = fixture_data
    out = P.extract_pipeline(
        spark, transcripts_sdf, drawer_dict, engine="hybrid"
    ).toPandas()
    _assert_frames_equal(out, expected, "hybrid")


def test_arrow_pipeline_matches_oracle(spark, transcripts_sdf, fixture_data, expected):
    _t, _m, drawer_dict = fixture_data
    out = P.extract_pipeline(
        spark, transcripts_sdf, drawer_dict, engine="arrow"
    ).toPandas()
    _assert_frames_equal(out, expected, "arrow")


def test_stable_ordering(spark, transcripts_sdf, fixture_data):
    """Window-over-partition ordering assigns contiguous ranks per conv."""
    _t, _m, drawer_dict = fixture_data
    out = P.ordered(P.extract_pipeline(spark, transcripts_sdf, drawer_dict))
    pdf = out.select("conv_id", "turn_idx", "turn_rank").toPandas()
    for _conv, grp in pdf.groupby("conv_id"):
        grp = grp.sort_values("turn_idx")
        assert list(grp.turn_rank) == list(range(1, len(grp) + 1))
