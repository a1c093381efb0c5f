"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``  — flagship extraction pipeline on sf0.001 (smoke check)
- ``queries()``     — operator registry (SURVEY.md §2 coverage), each
                      callable (spark, sf_dir) -> DataFrame
- ``oracle_sql()``  — matching DuckDB SQL per query (omitted only for the
                      difflib-backed flagship, which gets a rows-only check)

Implementation lives in cheque_ocr_project_spark.plans.queries; the local
parity test tests/test_driver_contract.py mirrors the driver's comparison.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cheque_ocr_project_spark.plans import queries as Q

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.q_flagship_extract(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
