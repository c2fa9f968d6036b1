"""Spatial predicates requiring geometry: heading-towards-area.

HeadingTowardsPredicate (fsm/symbolic/logic/predicates/
HeadingTowardsPredicate.scala:10-71): project the vessel's position one
hour ahead by speed/heading (great-circle dead reckoning,
utils/SpatialUtils.projectPoint:163-182), then test whether the segment
(current -> projected) intersects a target polygon (JTS in the
reference; pure-numpy segment/polygon intersection here — no geometry
library needed).

The Brest-port polygon is the one hardcoded in the reference; the
fishing-area polygon is an external file there (env-dependent) and is
registerable via ``register_area``.

Evaluation is a vectorized pandas UDF (Arrow-batched): geometry math is
the one predicate that genuinely exceeds Column expressions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

EARTH_RADIUS_KM = 6371

# HeadingTowardsPredicate.scala:22-40 — the Brest port polygon
BREST_PORT_POLYGON = np.array(
    [
        (-4.407797882145266, 48.382710198105684), (-4.4085430610266165, 48.38941230508402),
        (-4.410780059125649, 48.39596554138243), (-4.414459437657134, 48.40222343444966),
        (-4.419499438923959, 48.40804606114769), (-4.425787773966339, 48.41330318512496),
        (-4.433184104401638, 48.41787718105243), (-4.441523165405533, 48.421665679069655),
        (-4.450618461165942, 48.42458386886374), (-4.46026644995194, 48.426566410366696),
        (-4.4702511236245845, 48.427568906943286), (-4.480348876375414, 48.42756890694327),
        (-4.490333550048059, 48.426566410366696), (-4.4999815388340565, 48.42458386886374),
        (-4.509076834594467, 48.421665679069655), (-4.517415895598361, 48.41787718105243),
        (-4.52481222603366, 48.41330318512496), (-4.53110056107604, 48.40804606114769),
        (-4.536140562342865, 48.40222343444966), (-4.539819940874351, 48.39596554138243),
        (-4.542056938973382, 48.38941230508402), (-4.542802117854734, 48.382710198105684),
        (-4.5420394146395635, 48.37600896302291), (-4.539786449315992, 48.369458264939745),
        (-4.536094079424156, 48.363204350876714), (-4.531045217000188, 48.357386790420925),
        (-4.524752938359016, 48.35213536976702), (-4.517357932293757, 48.347567207479194),
        (-4.509025345957496, 48.34378415507323), (-4.499941099863272, 48.340870538994864),
        (-4.4903077539317735, 48.338891292916315), (-4.480340015218268, 48.33789052065888),
        (-4.470259984781731, 48.33789052065888), (-4.460292246068226, 48.338891292916315),
        (-4.450658900136727, 48.34087053899486), (-4.441574654042504, 48.34378415507323),
        (-4.433242067706241, 48.3475672074792), (-4.425847061640984, 48.35213536976702),
        (-4.419554782999813, 48.357386790420925), (-4.414505920575843, 48.363204350876714),
        (-4.410813550684008, 48.369458264939745), (-4.408560585360435, 48.37600896302291),
        (-4.407797882145266, 48.382710198105684),
    ]
)

AREAS: dict[str, np.ndarray] = {"BrestPort": BREST_PORT_POLYGON}


def register_area(name: str, coords: list[tuple[float, float]]) -> None:
    """Register an additional target polygon (e.g. FishingArea from the
    reference's external static file)."""
    AREAS[name] = np.asarray(coords, dtype=float)


def project_point(
    lon: np.ndarray, lat: np.ndarray, seconds: int, speed: np.ndarray, heading: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Great-circle dead reckoning (SpatialUtils.projectPoint:163-182):
    speed is knots (nm/h), distance = t * speed/3600 * 1.852 km."""
    dist_km = seconds * (speed / 3600.0) * 1.852
    delta = dist_km / EARTH_RADIUS_KM
    lat_r, lon_r, hdg_r = np.radians(lat), np.radians(lon), np.radians(heading)
    new_lat = np.arcsin(
        np.sin(lat_r) * np.cos(delta) + np.cos(lat_r) * np.sin(delta) * np.cos(hdg_r)
    )
    new_lon = lon_r + np.arctan2(
        np.sin(hdg_r) * np.sin(delta) * np.cos(lat_r),
        np.cos(delta) - np.sin(lat_r) * np.sin(new_lat),
    )
    return np.round(np.degrees(new_lon), 6), np.round(np.degrees(new_lat), 6)


def _segments_intersect(p1, p2, q1, q2) -> np.ndarray:
    """Vectorized proper/improper 2D segment intersection: segment
    (p1->p2) per row vs one polygon edge (q1->q2)."""

    def orient(a, b, c):
        return (b[..., 0] - a[..., 0]) * (c[..., 1] - a[..., 1]) - (
            b[..., 1] - a[..., 1]
        ) * (c[..., 0] - a[..., 0])

    d1 = orient(q1, q2, p1)
    d2 = orient(q1, q2, p2)
    d3 = orient(p1, p2, q1)
    d4 = orient(p1, p2, q2)
    return ((d1 * d2) <= 0) & ((d3 * d4) <= 0)


def _point_in_polygon(pts: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Ray casting, vectorized over points."""
    x, y = pts[:, 0], pts[:, 1]
    inside = np.zeros(len(pts), dtype=bool)
    n = len(poly)
    for i in range(n - 1):
        x1, y1 = poly[i]
        x2, y2 = poly[i + 1]
        cond = ((y1 > y) != (y2 > y)) & (
            x < (x2 - x1) * (y - y1) / (y2 - y1 + 1e-300) + x1
        )
        inside ^= cond
    return inside


def segment_intersects_polygon(
    a: np.ndarray, b: np.ndarray, poly: np.ndarray
) -> np.ndarray:
    """JTS line.intersects(polygon) equivalent: true if either endpoint
    is inside, or the segment crosses any edge."""
    hit = _point_in_polygon(a, poly) | _point_in_polygon(b, poly)
    for i in range(len(poly) - 1):
        q1 = np.broadcast_to(poly[i], a.shape)
        q2 = np.broadcast_to(poly[i + 1], a.shape)
        hit |= _segments_intersect(a, b, q1, q2)
    return hit


def heading_towards(area: str, projection_seconds: int = 3600) -> Column:
    """Boolean Column: does the 1-hour dead-reckoning segment intersect
    the named area?  Null attrs (e.g. RESET events) evaluate false."""
    if area not in AREAS:
        raise KeyError(
            f"unknown area {area!r}; known: {sorted(AREAS)} — add one with "
            "functions.spatial.register_area(name, coords)"
        )
    poly = AREAS[area]

    @F.pandas_udf(T.BooleanType())
    def _udf(lon: pd.Series, lat: pd.Series, speed: pd.Series, heading: pd.Series) -> pd.Series:
        valid = ~(lon.isna() | lat.isna() | speed.isna() | heading.isna())
        lonv = lon.fillna(0.0).to_numpy(float)
        latv = lat.fillna(0.0).to_numpy(float)
        nlon, nlat = project_point(
            lonv, latv, projection_seconds,
            speed.fillna(0.0).to_numpy(float), heading.fillna(0.0).to_numpy(float),
        )
        a = np.stack([lonv, latv], axis=1)
        b = np.stack([nlon, nlat], axis=1)
        return pd.Series(segment_intersects_polygon(a, b, poly) & valid.to_numpy())

    return _udf(F.col("lon"), F.col("lat"), F.col("speed"), F.col("heading"))
