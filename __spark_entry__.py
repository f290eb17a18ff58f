"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001.
``queries()`` / ``oracle_sql()`` expose the driver-facing catalog tier from
``etl_for_dumdums_spark.catalog``: exactly 50 queries covering every
SURVEY.md §2 operator (the driver's correctness gate checks the first 50
registered), each paired with a DuckDB oracle. Legacy/redundant forms live
in the catalog's extra tier (see OPERATORS.md "Catalog consolidation map")
and stay oracle-checked via tools/check_oracle.py.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from etl_for_dumdums_spark.catalog import ORACLE, QUERIES, load_all  # noqa: E402

load_all()


def _ensure_nanos_conf(spark: SparkSession) -> None:
    # testdata parquet carries INT64 TIMESTAMP(NANOS) columns; Spark must read
    # them as longs (the Tables accessor converts them to timestamps).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_nanos_conf(spark)
    return QUERIES["agg_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_nanos_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    return dict(ORACLE)
