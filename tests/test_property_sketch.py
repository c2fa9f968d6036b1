"""Property-based tests (hypothesis) for the r4 sketches: histogram
quantile cross-engine parity and error bound, blocked-bloom
no-false-negative and merge laws — generated inputs including NaN/inf
(the class of divergence the finite filter exists for)."""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

values_strategy = st.lists(
    st.floats(
        min_value=-50.0,
        max_value=150.0,
        allow_nan=False,
        allow_infinity=False,
        width=64,
    )
    # non-finite AND finite-but-huge: floor((huge - lo)/w) exceeds
    # int64 (or overflows to +-inf), where Spark's long cast saturates
    # but a naive DuckDB CAST(... AS BIGINT) raises — the twin must
    # clamp in double space before its cast (round-4 advice)
    | st.sampled_from(
        [
            float("nan"), float("inf"), float("-inf"),
            1e308, -1e308, 2.0**63, -(2.0**63), 1e19, -1e19,
        ]
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=8, deadline=None)
@given(values_strategy, st.integers(2, 32))
def test_hist_spark_duckdb_parity_fuzz(spark, vals, n_bins):
    """For ANY input (non-finite included) the Spark histogram quantiles
    equal the DuckDB twin's bit for bit."""
    from flink_rtcef_spark.operators.sketch import (
        hist_quantiles,
        hist_quantiles_sql,
        hist_sketch,
    )

    lo, hi = 0.0, 100.0
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    finite = [v for v in vals if math.isfinite(v)]
    sk = hist_sketch(df, "v", lo, hi, n_bins)
    got = {
        r.q: r.quantile_est
        for r in hist_quantiles(sk, [0.5, 0.9], lo, hi, n_bins).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    sql = hist_quantiles_sql("t", "v", lo, hi, [0.5, 0.9], n_bins)
    want = {q: e for q, e in con.execute(sql).fetchall()}
    assert got == want
    if not finite:
        assert got == {}  # nothing survives the finite filter


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-10.0, max_value=110.0,
                      allow_nan=False, allow_infinity=False, width=64),
            # SIGNED weights: negative ones must be dropped by both
            # engines (not summed into non-monotonic cumulative counts)
            st.one_of(st.none(), st.integers(-5, 7)),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(2, 16),
)
def test_hist_weighted_parity_signed_weights_fuzz(spark, rows, n_bins):
    """Weighted histogram quantiles match the DuckDB twin bit for bit
    for ANY (value, weight) input including NULL and negative weights,
    and equal the plain histogram of the kept-weight expansion."""
    from flink_rtcef_spark.operators.sketch import (
        hist_quantiles,
        hist_quantiles_sql,
        hist_sketch,
    )

    lo, hi = 0.0, 100.0
    df = spark.createDataFrame(rows, "v double, w int")
    sk = hist_sketch(df, "v", lo, hi, n_bins, weight_col="w")
    got = {
        r.q: r.quantile_est
        for r in hist_quantiles(sk, [0.5, 0.9], lo, hi, n_bins).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE, w INT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql = hist_quantiles_sql(
        "t", "v", lo, hi, [0.5, 0.9], n_bins, weight_expr="w"
    )
    want = {q: e for q, e in con.execute(sql).fetchall()}
    # zero-total inputs (every kept weight 0) emit NO rows, both engines
    assert got == want

    expanded = [(v,) for v, w in rows if w and w > 0 for _ in range(w)]
    if expanded:
        plain = hist_sketch(
            spark.createDataFrame(expanded, "v double"), "v", lo, hi, n_bins
        )
        # drop the weighted side's cnt=0 bins (groups whose only rows
        # had weight 0) — the expansion has no rows for them at all
        assert sorted(map(tuple, sk.filter("cnt > 0").collect())) == sorted(
            map(tuple, plain.collect())
        )


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "dd", "ee"]),
            # SIGNED weights: NULL must not silently contribute 0 and
            # negative must not break the CMS upper bound — both are
            # dropped, same contract as hist_sketch
            st.one_of(st.none(), st.integers(-5, 7)),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_cms_weighted_signed_weights_fuzz(spark, rows):
    """Weighted CMS == CMS of the kept-weight expansion (exact sketch
    identity — NULL/negative-weight rows dropped), and cms_lookup never
    under-estimates the kept weighted count for ANY signed input."""
    from flink_rtcef_spark.operators.sketch import (
        cms_build,
        cms_lookup,
    )

    df = spark.createDataFrame(rows, "v string, w int")
    weighted = cms_build(df, "v", weight_col="w")

    kept = [(v,) for v, w in rows if w is not None and w > 0 for _ in range(w)]
    expanded = cms_build(
        spark.createDataFrame(kept, "v string")
        if kept
        else spark.createDataFrame([], "v string"),
        "v",
    )
    # zero-weight rows contribute cnt=0 cells in the weighted build;
    # the expansion has no rows for them at all
    assert sorted(map(tuple, weighted.filter("cnt > 0").collect())) == sorted(
        map(tuple, expanded.collect())
    )

    true_counts: dict = {}
    for v, w in rows:
        if w is not None and w > 0:
            true_counts[v] = true_counts.get(v, 0) + w
    probes = spark.createDataFrame([(v,) for v in set(x for x, _ in rows)], "v string")
    est = {
        r["v"]: r["cms_count"]
        for r in cms_lookup(weighted, probes, "v").collect()
    }
    for v, true in true_counts.items():
        assert est[v] >= true, (v, est[v], true)  # the one-sided guarantee


@settings(max_examples=8, deadline=None)
@given(values_strategy, st.integers(2, 32))
def test_hist_quantile_error_bound_fuzz(spark, vals, n_bins):
    """est(q) is within one bin width of the rank-ceil(q*T) clamped
    value — the accuracy contract, for any input and bin count."""
    from flink_rtcef_spark.operators.sketch import hist_quantiles, hist_sketch

    lo, hi = 0.0, 100.0
    w = (hi - lo) / n_bins
    finite = sorted(
        min(max(v, lo), hi - 1e-9) for v in vals if math.isfinite(v)
    )
    if not finite:
        return
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    sk = hist_sketch(df, "v", lo, hi, n_bins)
    for r in hist_quantiles(sk, [0.25, 0.5, 1.0], lo, hi, n_bins).collect():
        rank = r.q * len(finite)
        target = finite[max(0, math.ceil(rank) - 1)]
        assert abs(r.quantile_est - target) <= w + 1e-9, (
            r.q, r.quantile_est, target, w)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=80),
    st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=40),
    st.booleans(),
)
def test_bloom_no_false_negative_fuzz(spark, members, probes, prehashed):
    """No member is ever dropped, in either hash mode, for any int64
    member/probe population (including negatives — pmod territory)."""
    from flink_rtcef_spark.operators.sketch import (
        bloom_build,
        bloom_filter_members,
    )

    m, k = 1 << 12, 4
    mem_df = spark.createDataFrame([(v,) for v in members], "h long")
    probe_df = spark.createDataFrame(
        [(v,) for v in set(members) | set(probes)], "h long"
    )
    sk = bloom_build(mem_df, "h", m, k, prehashed=prehashed)
    kept = {r.h for r in bloom_filter_members(
        probe_df, "h", sk, m, k, prehashed=prehashed).collect()}
    assert set(members) <= kept


@settings(max_examples=6, deadline=None)
@given(st.lists(st.integers(0, 10**9), min_size=2, max_size=80))
def test_bloom_and_hist_merge_laws_fuzz(spark, vals):
    """merge(shard sketches) == whole-input sketch, exactly, for any
    3-way split — the property that makes both sketches distributable."""
    from flink_rtcef_spark.operators.sketch import (
        bloom_build,
        bloom_merge,
        hist_merge,
        hist_sketch,
    )

    df = spark.createDataFrame([(v,) for v in vals], "h long")
    parts = [df.filter(F.pmod(F.col("h"), F.lit(3)) == i) for i in range(3)]

    whole_b = bloom_build(df, "h", 1 << 10, 3)
    merged_b = bloom_merge(*[bloom_build(p, "h", 1 << 10, 3) for p in parts])
    assert sorted(map(tuple, whole_b.collect())) == sorted(
        map(tuple, merged_b.collect()))

    whole_h = hist_sketch(df.select(F.col("h").cast("double").alias("v")),
                          "v", 0.0, 1e9, 16)
    merged_h = hist_merge(*[
        hist_sketch(p.select(F.col("h").cast("double").alias("v")),
                    "v", 0.0, 1e9, 16)
        for p in parts
    ])
    assert sorted(map(tuple, whole_h.collect())) == sorted(
        map(tuple, merged_h.collect()))
