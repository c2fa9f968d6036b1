"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real implementations live in ``flink_rtcef_spark``; this module
only adapts them to the driver contract.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from flink_rtcef_spark import queries as q  # noqa: E402

q.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the engine's core custom operator end-to-end: the SRE sequence
    pattern compiled to an SDFA and executed by the batch CEP operator
    (falls back to the SQL-expressible formulation if the operator
    surface is mid-refactor).
    """
    name = "cep_sdfa_detect" if "cep_sdfa_detect" in q.QUERIES else "cep_seq_contiguous_sql"
    return q.QUERIES[name](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(q.ORACLES)
