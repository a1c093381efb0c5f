"""Deterministic stratified sampling — training-mix weights at corpus scale.

A pre-training corpus is assembled from heterogeneous sources with
per-source mixing rates (web 10%, reference text 100%, boilerplate 1%, ...).
At 100 TB the sample must be:

- **stateless & deterministic** — the same document always gets the same
  keep/drop decision (resumable jobs, reproducible mixes, no RNG state to
  shuffle or checkpoint);
- **growth-stable** — adding documents never flips existing decisions
  (keyed on the document id, not on position or a global count);
- **one scan, zero shuffles** — the decision is a pure per-row expression.

Decision rule (exact integer arithmetic, recomputable bit-for-bit by the
DuckDB oracle): ``keep iff ((id mod P) * MIX mod P) mod 10000 <
rate(source) * 10000``. The id is reduced mod P before the multiply so the
64-bit product cannot overflow for any int64 id (same guard as
similarity.ivf_pivots).

Reference analog: the reference samples its batch inputs by directory
globbing + slicing (tiff_processor.py:47-58); this is the scale-correct
re-expression of "take a controlled fraction of each source".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SAMPLE_MIX = 2654435761
SAMPLE_MOD = (1 << 31) - 1
_RES = 10_000  # rate resolution: 0.01%


def sample_bucket(id_col: Column) -> Column:
    """Deterministic per-row bucket in [0, 10000)."""
    return F.pmod(
        F.pmod(id_col, F.lit(SAMPLE_MOD)) * SAMPLE_MIX, F.lit(SAMPLE_MOD)
    ) % _RES


def stratified_sample(df: DataFrame, id_col: str, strata_col: str,
                      rates: dict[str, float],
                      default_rate: float = 1.0) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically by id.

    ``rates`` maps stratum value -> keep rate in [0, 1]; strata not listed
    use ``default_rate``. Rates are quantized to 1/10000 (exact integer
    thresholds — no float comparison ambiguity across engines)."""
    thr = F.lit(int(round(default_rate * _RES)))
    for k, v in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == k, int(round(v * _RES))).otherwise(thr)
    return df.filter(sample_bucket(F.col(id_col)) < thr)


def sample_bucket_sql(id_expr: str) -> str:
    return f"((({id_expr}) % {SAMPLE_MOD}) * {SAMPLE_MIX}) % {SAMPLE_MOD} % {_RES}"


def stratified_sample_sql(strata_expr: str, rates: dict[str, float],
                          default_rate: float = 1.0) -> str:
    """WHERE-clause fragment mirroring stratified_sample bit-for-bit."""
    whens = " ".join(
        f"WHEN {strata_expr} = '{k}' THEN {int(round(v * _RES))}"
        for k, v in sorted(rates.items())
    )
    return f"CASE {whens} ELSE {int(round(default_rate * _RES))} END"
