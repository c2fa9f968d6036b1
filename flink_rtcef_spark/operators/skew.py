"""Skew-handling helpers for hot keys at scale.

AQE's skew-join splitting covers sort-merge joins automatically; these
helpers cover the two places it cannot:

- salted_join: replicate the build side N ways so one hot probe key
  fans out over N tasks (broadcast-unfriendly sizes, pre-AQE planning,
  or deliberate layout control);
- two_phase_agg: explicit partial aggregation under a salt for
  high-cardinality-update aggregations where a single reducer key would
  bottleneck (Catalyst's partial aggregation handles sums; this shape
  is for order-sensitive or sketch-merging aggregations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side salted and the build side
    replicated n_salts times: the shuffle key becomes (key, salt), so a
    hot key's rows spread over n_salts reducers instead of one.

    Only ``inner`` and ``left`` (probe-outer) are sound: the build side
    is replicated, so a right/full join would surface each unmatched
    build row once per salt replica (n_salts duplicates)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "replicated build side would emit unmatched rows once per salt"
        )
    salted_probe = probe.withColumn(
        "__salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    salted_build = build.crossJoin(
        F.broadcast(
            probe.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = salted_probe.join(salted_build, [key, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 8,
) -> DataFrame:
    """Aggregate under (key, salt) first, then merge partials per key:
    ``aggs`` compute the salted partials, ``final_aggs`` merge them
    (e.g. partial sum -> sum of sums)."""
    salted = df.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(*aggs)
    return partial.groupBy(key).agg(*final_aggs)
