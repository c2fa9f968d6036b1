"""HeadingTowardsPredicate: dead-reckoning projection + polygon
intersection, numerically checked against the reference's formulas."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from flink_rtcef_spark.functions.spatial import (
    BREST_PORT_POLYGON,
    heading_towards,
    project_point,
    segment_intersects_polygon,
)


def test_project_point_formula():
    # heading due north at 60 knots for 1 h = 60 nm = 111.12 km ~ 1 deg lat
    nlon, nlat = project_point(
        np.array([-4.5]), np.array([48.0]), 3600, np.array([60.0]), np.array([0.0])
    )
    assert nlon[0] == pytest.approx(-4.5, abs=1e-6)
    assert nlat[0] == pytest.approx(48.0 + 0.9993, abs=0.01)
    # due east: latitude stays (to first order), longitude grows
    nlon, nlat = project_point(
        np.array([-4.5]), np.array([48.0]), 3600, np.array([60.0]), np.array([90.0])
    )
    assert nlat[0] == pytest.approx(48.0, abs=0.02)
    assert nlon[0] > -4.5 + 1.0  # ~1/cos(48) degrees east


def test_segment_polygon_intersection():
    poly = BREST_PORT_POLYGON
    center = np.array([[-4.4753, 48.38273]])
    far = np.array([[-5.5, 48.0]])
    # segment ending inside
    assert segment_intersects_polygon(far, center, poly)[0]
    # segment fully outside
    assert not segment_intersects_polygon(
        np.array([[-5.5, 48.0]]), np.array([[-5.4, 48.1]]), poly
    )[0]
    # segment crossing straight through
    assert segment_intersects_polygon(
        np.array([[-4.6, 48.38]]), np.array([[-4.35, 48.38]]), poly
    )[0]


def test_heading_towards_on_spark(spark):
    rows = pd.DataFrame(
        [
            # heading straight at the port center from the west, fast
            ("approach", -4.6, 48.3827, 20.0, 90.0),
            # heading away from the port
            ("depart", -4.6, 48.3827, 20.0, 270.0),
            # RESET-like row with nulls
            ("reset", None, None, None, None),
        ],
        columns=["name", "lon", "lat", "speed", "heading"],
    )
    df = spark.createDataFrame(rows)
    out = (
        df.withColumn("towards", heading_towards("BrestPort"))
        .select("name", "towards")
        .toPandas()
        .set_index("name")["towards"]
    )
    assert bool(out["approach"])
    assert not bool(out["depart"])
    assert not bool(out["reset"])


def test_predicate_registry_integration():
    from flink_rtcef_spark.plans.compiler import compile_pattern

    compiled = compile_pattern(
        ";(HeadingTowardsPredicate(BrestPort),WithinCircle(-4.4753,48.38273,5.0)){partitionBy:mmsi}"
    )
    assert len(compiled.atoms) == 2
