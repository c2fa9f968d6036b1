from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from flink_rtcef_spark.operators.skew import salted_join, two_phase_agg


def test_salted_join_equals_plain_join(spark):
    probe = spark.createDataFrame(
        pd.DataFrame({"k": ["hot"] * 100 + ["a", "b"] * 5, "v": range(110)})
    )
    build = spark.createDataFrame(
        pd.DataFrame({"k": ["hot", "a", "b", "c"], "w": [1, 2, 3, 4]})
    )
    plain = probe.join(build, "k").select("k", "v", "w").toPandas()
    salted = salted_join(probe, build, "k").select("k", "v", "w").toPandas()
    ps = plain.sort_values(["k", "v"]).reset_index(drop=True)
    ss = salted.sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(ps, ss)


def test_two_phase_agg_equals_plain(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["x"] * 1000 + ["y"] * 10, "v": range(1010)})
    )
    plain = df.groupBy("k").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
    ).toPandas()
    two = two_phase_agg(
        df,
        "k",
        aggs=[F.sum("v").alias("ps"), F.count(F.lit(1)).alias("pn")],
        final_aggs=[F.sum("ps").alias("s"), F.sum("pn").alias("n")],
    ).toPandas()
    pd.testing.assert_frame_equal(
        plain.sort_values("k").reset_index(drop=True),
        two.sort_values("k").reset_index(drop=True),
        check_dtype=False,
    )


def test_salted_join_left_equals_plain_left(spark):
    probe = spark.createDataFrame(
        pd.DataFrame({"k": ["hot"] * 50 + ["nomatch"] * 3, "v": range(53)})
    )
    build = spark.createDataFrame(
        pd.DataFrame({"k": ["hot", "c"], "w": [1, 4]})
    )
    plain = probe.join(build, "k", "left").select("k", "v", "w").toPandas()
    salted = salted_join(probe, build, "k", how="left").select("k", "v", "w").toPandas()
    ps = plain.sort_values(["k", "v"]).reset_index(drop=True)
    ss = salted.sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(ps, ss)


def test_salted_join_rejects_outer_builds(spark):
    import pytest

    probe = spark.createDataFrame(pd.DataFrame({"k": ["a"], "v": [1]}))
    build = spark.createDataFrame(pd.DataFrame({"k": ["a"], "w": [1]}))
    for how in ("right", "full", "outer", "left_anti"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(probe, build, "k", how=how)
