"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable.
``oracle_sql()`` — matching DuckDB-runnable ANSI SQL per query.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from irs_990_efiler_database_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's own validation query — filings crosstab
    (README.md:77-82) analog, status × year counts over sf0.001."""
    return _q.all_queries()["agg_pivot_status_by_year"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.all_queries()


def oracle_sql() -> dict[str, str]:
    return _q.all_oracles()
