"""As-of join + binned range join (operators/joins.py) against two
independent oracles: DuckDB's native ASOF JOIN and pandas merge_asof.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from flink_rtcef_spark.operators.joins import as_of_join, range_join_binned
from tests.conftest import SF_SMOKE

from tools.check_oracle import compare


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW events AS "
        f"SELECT * FROM read_parquet('{SF_SMOKE}/events.parquet')"
    )
    return con


def test_asof_backward_matches_duckdb_on_events(spark, duck):
    """Each purchase enriched with the user's most recent click at or
    before it — ours vs DuckDB ASOF LEFT JOIN, full-table."""
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "user_id", "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("tms"),
        "value",
    )
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "tms"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "tms", F.col("value").alias("click_value"),
        F.col("event_id").alias("click_id"),
    )
    ours = as_of_join(
        left, right, on="user_id", left_ts="tms",
        right_cols=["click_value", "click_id"],
    ).toPandas()
    # DuckDB ASOF breaks equal-ts ties arbitrarily among right rows; the
    # sf0.001 events table has unique (user_id, ts) per type, so the
    # match is unique.  ORDER is irrelevant (compare() sorts).
    oracle = duck.execute(
        """
        WITH ev AS (SELECT event_id, user_id, event_type,
                           epoch_ms(ts) AS tms, value FROM events),
        l AS (SELECT event_id, user_id, tms FROM ev WHERE event_type='purchase'),
        r AS (SELECT user_id, tms, value AS click_value, event_id AS click_id
              FROM ev WHERE event_type='click')
        SELECT l.event_id, l.user_id, l.tms,
               r.tms AS tms_right, r.click_value, r.click_id
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.tms >= r.tms
        """
    ).df()
    problems = compare("asof_backward", ours, oracle)
    assert not problems, problems


def _random_frames(seed: int, n_left: int = 400, n_right: int = 300):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_left),
            "t": rng.integers(0, 1000, n_left),
            "lv": rng.integers(0, 100, n_left),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_right),
            "t": rng.integers(0, 1000, n_right),
            "rv": rng.integers(0, 100, n_right).astype("float64"),
        }
    )
    # merge_asof demands unique right (k, t) for a deterministic match
    right = right.drop_duplicates(["k", "t"])
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 50])
def test_asof_matches_pandas_merge_asof(spark, direction, tolerance):
    left, right = _random_frames(seed=7)
    ours = (
        as_of_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k", left_ts="t", right_cols=["rv"],
            direction=direction, tolerance=tolerance,
        )
        .toPandas()
        .sort_values(["k", "t", "lv"])
        .reset_index(drop=True)
    )
    expected = (
        pd.merge_asof(
            left.sort_values("t", kind="mergesort"),
            right.sort_values("t", kind="mergesort"),
            on="t", by="k", direction=direction,
            tolerance=tolerance,
        )
        .sort_values(["k", "t", "lv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_series_equal(
        ours["rv"], expected["rv"], check_names=False
    )
    # the matched timestamp column is NULL exactly where rv is NULL
    assert ours["t_right"].isna().equals(ours["rv"].isna())


def test_asof_null_payload_still_wins(spark):
    """A right row whose payload is NULL must still be the as-of match
    (the struct carries the whole row; per-column last(ignorenulls)
    would wrongly reach back to an older non-null row)."""
    left = spark.createDataFrame([(1, 10)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 1, 5.0), (1, 9, None)], "k int, t int, rv double"
    )
    row = as_of_join(left, right, on="k", left_ts="t").collect()[0]
    assert row["t_right"] == 9 and row["rv"] is None


def test_asof_equal_ts_inclusive(spark):
    left = spark.createDataFrame([(1, 5)], "k int, t int")
    right = spark.createDataFrame([(1, 5, 1.0)], "k int, t int, rv double")
    for direction in ("backward", "forward", "nearest"):
        row = as_of_join(
            left, right, on="k", left_ts="t", direction=direction
        ).collect()[0]
        assert row["rv"] == 1.0, direction


def test_asof_nearest_tie_prefers_backward(spark):
    """Equidistant matches resolve to the backward row, the pandas
    merge_asof tie rule (pinned empirically: left t=10 against right
    t=5/t=15 picks t=5)."""
    left = spark.createDataFrame([(1, 10)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 5, 1.0), (1, 15, 2.0)], "k int, t int, rv double"
    )
    row = as_of_join(
        left, right, on="k", left_ts="t", direction="nearest"
    ).collect()[0]
    assert row["rv"] == 1.0 and row["t_right"] == 5


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_global_on_none_matches_merge_asof(spark, direction):
    """on=None = pandas merge_asof without `by` (one global timeline),
    for the plain operator AND the presplit (whose time shards make
    the global case parallel — the plan must hash-partition on the
    shard id, not collapse to a single partition)."""
    from flink_rtcef_spark.operators.joins import as_of_join_presplit

    left, right = _random_frames(seed=29)
    right = right.drop_duplicates(["t"])  # global match must be unique
    expected = (
        pd.merge_asof(
            left.sort_values(["t", "lv"], kind="mergesort"),
            right.sort_values("t", kind="mergesort").drop(columns=["k"]),
            on="t", direction=direction,
        )
        .sort_values(["k", "t", "lv"])
        .reset_index(drop=True)
    )
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right.drop(columns=["k"]))
    for fn, kw in (
        (as_of_join, {}),
        (as_of_join_presplit, {"shard_span": 100}),
    ):
        ours = (
            fn(
                ldf, rdf, on=None, left_ts="t", right_cols=["rv"],
                direction=direction, **kw,
            )
            .toPandas()
            .sort_values(["k", "t", "lv"])
            .reset_index(drop=True)
        )
        pd.testing.assert_series_equal(
            ours["rv"], expected["rv"], check_names=False
        )
    # the presplit global plan parallelizes on the shard id
    plan = as_of_join_presplit(
        ldf, rdf, on=None, shard_span=100, left_ts="t",
        right_cols=["rv"], direction=direction,
    )._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__shard" in plan, plan


def test_asof_strict_excludes_equal_ts(spark):
    """allow_exact_matches=False: a right row AT the left timestamp is
    skipped and the match falls to the strictly-earlier/later row —
    for every direction and for the presplit twin (the nearest case
    also flips its tie: with the equal-ts backward row excluded, the
    equidistant strict pair resolves backward-first as in pandas)."""
    from flink_rtcef_spark.operators.joins import as_of_join_presplit

    left = spark.createDataFrame([(1, 10)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 4, 1.0), (1, 10, 2.0), (1, 16, 3.0)], "k int, t int, rv double"
    )
    want = {"backward": 1.0, "forward": 3.0, "nearest": 1.0}
    for direction, rv in want.items():
        for fn, kw in (
            (as_of_join, {}),
            (as_of_join_presplit, {"shard_span": 7}),
        ):
            row = fn(
                left, right, on="k", left_ts="t", direction=direction,
                allow_exact_matches=False, **kw,
            ).collect()[0]
            assert row["rv"] == rv, (direction, fn.__name__, row)


def test_asof_name_collision_suffix(spark):
    left = spark.createDataFrame([(1, 5, 9.0)], "k int, t int, rv double")
    right = spark.createDataFrame([(1, 4, 1.0)], "k int, t int, rv double")
    out = as_of_join(left, right, on="k", left_ts="t")
    assert set(out.columns) == {"k", "t", "rv", "t_right", "rv_right"}
    row = out.collect()[0]
    assert row["rv"] == 9.0 and row["rv_right"] == 1.0


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 50])
@pytest.mark.parametrize("shard_span", [7, 100, 5000])
def test_asof_presplit_matches_merge_asof(spark, direction, tolerance, shard_span):
    """The hot-key presplit variant is semantics-identical to
    as_of_join / pandas merge_asof for every shard width: tiny (carry
    chains across many shards), moderate, and wider than the whole
    timeline (degenerates to one shard = the plain path)."""
    from flink_rtcef_spark.operators.joins import as_of_join_presplit

    left, right = _random_frames(seed=13)
    ours = (
        as_of_join_presplit(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k", shard_span=shard_span, left_ts="t", right_cols=["rv"],
            direction=direction, tolerance=tolerance,
        )
        .toPandas()
        .sort_values(["k", "t", "lv"])
        .reset_index(drop=True)
    )
    expected = (
        pd.merge_asof(
            left.sort_values("t", kind="mergesort"),
            right.sort_values("t", kind="mergesort"),
            on="t", by="k", direction=direction,
            tolerance=tolerance,
        )
        .sort_values(["k", "t", "lv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_series_equal(
        ours["rv"], expected["rv"], check_names=False
    )
    assert ours["t_right"].isna().equals(ours["rv"].isna())


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_presplit_hot_key(spark, direction):
    """One key owning ~90% of both sides — the distribution the
    presplit exists for — still matches the unsharded operator row for
    row (left rows whose shard has no right row take the carry-in
    path; empty left shards inherit across multiple shard gaps), for
    every direction the plain operator supports."""
    from flink_rtcef_spark.operators.joins import as_of_join_presplit

    rng = np.random.default_rng(3)
    n = 3000
    left = pd.DataFrame(
        {
            "k": np.where(rng.random(n) < 0.9, 0, rng.integers(1, 5, n)),
            "t": rng.integers(0, 10_000, n),
            "lv": np.arange(n),
        }
    )
    # sparse right side: long stretches of left-only shards
    right = pd.DataFrame(
        {
            "k": np.where(rng.random(60) < 0.9, 0, rng.integers(1, 5, 60)),
            "t": rng.integers(0, 10_000, 60),
            "rv": rng.integers(0, 100, 60).astype("float64"),
        }
    ).drop_duplicates(["k", "t"])
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
    plain = (
        as_of_join(
            ldf, rdf, on="k", left_ts="t", right_cols=["rv"],
            direction=direction,
        )
        .toPandas().sort_values(["k", "t", "lv"]).reset_index(drop=True)
    )
    sharded = (
        as_of_join_presplit(
            ldf, rdf, on="k", shard_span=250, left_ts="t",
            right_cols=["rv"], direction=direction,
        )
        .toPandas().sort_values(["k", "t", "lv"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(sharded, plain)


def test_asof_presplit_unorderable_payload(spark):
    """A map-typed right payload column rides through BOTH operators:
    the presplit carry uses max_by/first over the payload (carried,
    never compared), so unorderable types must not raise (a
    struct-ordered max over the payload would)."""
    from flink_rtcef_spark.operators.joins import as_of_join_presplit

    left = spark.createDataFrame([(1, 10), (1, 25), (2, 5)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 8, {"a": "x"}), (1, 20, {"b": "y"})],
        "k int, t int, attrs map<string,string>",
    )
    for fn, kw in (
        (as_of_join, {}),
        (as_of_join_presplit, {"shard_span": 7}),
        # nearest picks the same matches here (8 is nearer 10 than 20;
        # 20 is the only candidate for 25) and exercises the two-sided
        # carry's max_by/min_by over the unorderable payload
        (as_of_join_presplit, {"shard_span": 7, "direction": "nearest"}),
    ):
        rows = {
            (r["k"], r["t"]): r["attrs"]
            for r in fn(
                left, right, on="k", left_ts="t", right_cols=["attrs"], **kw
            ).collect()
        }
        assert rows[(1, 10)] == {"a": "x"}
        assert rows[(1, 25)] == {"b": "y"}
        assert rows[(2, 5)] is None


def test_asof_presplit_guards(spark):
    from flink_rtcef_spark.operators.joins import as_of_join_presplit

    left = spark.createDataFrame([(1, 5)], "k int, t int")
    right = spark.createDataFrame([(1, 4, 1.0)], "k int, t int, rv double")
    with pytest.raises(ValueError, match="shard_span"):
        as_of_join_presplit(left, right, on="k", shard_span=0, left_ts="t")
    tleft = left.withColumn("t", F.timestamp_seconds("t"))
    tright = right.withColumn("t", F.timestamp_seconds("t"))
    with pytest.raises(ValueError, match="unix_millis"):
        as_of_join_presplit(tleft, tright, on="k", shard_span=10, left_ts="t")


def test_range_join_binned_matches_plain_range_join(spark, duck):
    """Binned rewrite == DuckDB's inequality join, on value intervals
    over the events table (no equi key: the naive Spark plan here is a
    nested loop)."""
    iv = duck.execute(
        """
        SELECT event_id AS iv_id, value * 10 AS lo, value * 10 + 40 AS hi
        FROM events WHERE event_type = 'purchase' AND event_id % 7 = 0
        """
    ).df()
    pts = duck.execute(
        "SELECT event_id AS pt_id, value * 25 AS v FROM events WHERE event_id % 5 = 0"
    ).df()
    con = duckdb.connect()
    con.register("iv", iv)
    con.register("pts", pts)
    oracle = con.execute(
        "SELECT pt_id, v, iv_id, lo, hi FROM pts JOIN iv "
        "ON iv.lo <= pts.v AND pts.v <= iv.hi"
    ).df()
    ours = range_join_binned(
        spark.createDataFrame(pts),
        spark.createDataFrame(iv),
        left_point="v", right_lo="lo", right_hi="hi", bin_width=50,
    ).toPandas()
    problems = compare("range_join_binned", ours, oracle)
    assert not problems, problems


def test_range_join_binned_left_keeps_unmatched(spark):
    pts = spark.createDataFrame([(1, 5.0), (2, 500.0)], "pt_id int, v double")
    iv = spark.createDataFrame([(7, 0.0, 10.0)], "iv_id int, lo double, hi double")
    out = range_join_binned(
        pts, iv, left_point="v", right_lo="lo", right_hi="hi",
        bin_width=20, how="left",
    ).toPandas().sort_values("pt_id")
    assert len(out) == 2
    assert out.iloc[0]["iv_id"] == 7 and pd.isna(out.iloc[1]["iv_id"])


def test_asof_plan_single_exchange(spark):
    """The whole as-of is ONE hash exchange on the key + one sort —
    the property that survives 100 TB (no join, no broadcast)."""
    left, right = _random_frames(seed=3)
    plan = as_of_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="k", left_ts="t",
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_asof_nearest_plan_single_exchange(spark):
    """nearest keeps the directional paths' plan shape: the tripled
    union (left + two right copies) still hash-partitions ONCE for the
    shared window sort — no join, no broadcast."""
    left, right = _random_frames(seed=3)
    plan = as_of_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="k", left_ts="t", direction="nearest",
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_asof_presplit_plan_no_nested_loop(spark):
    """The presplit variant pays exactly one equi-join (the carry-in
    on (key, shard)) on top of the window exchanges — never a
    BroadcastNestedLoopJoin, whatever the optimizer picks for the
    small carry side."""
    left, right = _random_frames(seed=3)
    from flink_rtcef_spark.operators.joins import as_of_join_presplit

    plan = as_of_join_presplit(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="k", shard_span=100, left_ts="t",
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 60)),
        min_size=1, max_size=25,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 60)),
        min_size=0, max_size=25,
    ),
    st.sampled_from(["backward", "forward", "nearest"]),
    st.sampled_from([None, 7]),
    st.booleans(),
)
def test_asof_fuzz_matches_merge_asof(
    spark, lrows, rrows, direction, tolerance, allow_exact
):
    """Randomized as-of parity vs pandas merge_asof: tiny key space
    forces duplicate left timestamps, empty-right keys, equal-ts
    left/right collisions (the allow_exact_matches discriminator),
    and distance ties; the presplit variant (odd shard width) must
    agree on the full parameter surface."""
    from flink_rtcef_spark.operators.joins import as_of_join_presplit

    left = pd.DataFrame(lrows, columns=["k", "t"]).astype("int64")
    left["lv"] = range(len(left))
    right = (
        pd.DataFrame(rrows, columns=["k", "t"])
        .astype("int64")
        .drop_duplicates(["k", "t"])
    )
    right["rv"] = [float(i) for i in range(len(right))]

    expected = (
        pd.merge_asof(
            left.sort_values(["t", "lv"], kind="mergesort"),
            right.sort_values("t", kind="mergesort"),
            on="t", by="k", direction=direction, tolerance=tolerance,
            allow_exact_matches=allow_exact,
        )
        .sort_values(["k", "t", "lv"])
        .reset_index(drop=True)
    )
    ldf = spark.createDataFrame(left)
    rdf = (
        spark.createDataFrame(right)
        if len(right)
        else spark.createDataFrame([], "k bigint, t bigint, rv double")
    )
    variants = [
        lambda: as_of_join(
            ldf, rdf, on="k", left_ts="t", right_cols=["rv"],
            direction=direction, tolerance=tolerance,
            allow_exact_matches=allow_exact,
        ),
        lambda: as_of_join_presplit(
            ldf, rdf, on="k", shard_span=13, left_ts="t",
            right_cols=["rv"], direction=direction, tolerance=tolerance,
            allow_exact_matches=allow_exact,
        ),
    ]
    for fn in variants:
        ours = (
            fn().toPandas()
            .sort_values(["k", "t", "lv"])
            .reset_index(drop=True)
        )
        pd.testing.assert_series_equal(
            ours["rv"], expected["rv"], check_names=False
        )


# ------------------------------------------------------ overlap join --
def _interval_fixture(spark, n=400, seed=5):
    import random

    rnd = random.Random(seed)
    a, b = [], []
    for i in range(n):
        lo = rnd.randint(0, 5000)
        a.append((i, f"k{i % 3}", lo, lo + rnd.randint(0, 300)))
        lo = rnd.randint(0, 5000)
        b.append((1000 + i, f"k{i % 3}", lo, lo + rnd.randint(0, 300)))
    la = spark.createDataFrame(a, "a_id long, key string, a_lo long, a_hi long")
    rb = spark.createDataFrame(b, "b_id long, key string, b_lo long, b_hi long")
    return la, rb


def test_interval_overlap_join_matches_duckdb(spark):
    """Binned overlap join == the all-pairs SQL predicate, each pair
    exactly once (the canonical-bin trick replaces a distinct pass)."""
    import duckdb

    from flink_rtcef_spark.operators.joins import interval_overlap_join

    la, rb = _interval_fixture(spark)
    got = {
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            la, rb, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=256, on="key"
        ).collect()
    }
    con = duckdb.connect()
    con.register("la", la.toPandas())
    con.register("rb", rb.toPandas())
    want = set(
        map(
            tuple,
            con.execute(
                "SELECT a_id, b_id FROM la JOIN rb USING (key) "
                "WHERE a_lo <= b_hi AND b_lo <= a_hi"
            ).fetchall(),
        )
    )
    assert got == want and len(want) > 100
    # exactly once: the join emits no duplicate pairs
    n_rows = interval_overlap_join(
        la, rb, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=256, on="key"
    ).count()
    assert n_rows == len(got)


def test_interval_overlap_join_bin_width_invariant(spark):
    from flink_rtcef_spark.operators.joins import interval_overlap_join

    la, rb = _interval_fixture(spark, n=120, seed=9)
    results = []
    for bw in (64, 500, 10000):
        results.append(
            {
                (r["a_id"], r["b_id"])
                for r in interval_overlap_join(
                    la, rb, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=bw
                ).collect()
            }
        )
    assert results[0] == results[1] == results[2]


def test_interval_overlap_join_mixed_dtypes_above_2_53(spark):
    """Mixed integral/fractional bounds above 2**53 (r8 ADVICE): the
    integral side's covering bins use exact 64-bit division while a
    greatest()-then-divide dedup bin would coerce the long to float64
    (spacing 256 at 2**60) and land in a different width-10 bin —
    silently dropping pairs.  The fix computes the dedup bin as
    max(bin(l_lo), bin(r_lo)), each side via its own exact path, so
    the binned join must equal Spark's own all-pairs predicate."""
    from flink_rtcef_spark.operators.joins import interval_overlap_join

    t0 = 1 << 60
    rows_l = [
        (i, t0 + i * 1000 + 3, t0 + i * 1000 + 7) for i in range(40)
    ]
    rows_r = [
        (100 + i, float(t0 + i * 1000), float(t0 + i * 1000 + 500))
        for i in range(40)
    ]
    la = spark.createDataFrame(rows_l, "a_id long, a_lo long, a_hi long")
    rb = spark.createDataFrame(rows_r, "b_id long, b_lo double, b_hi double")
    got = {
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            la, rb, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=10
        ).collect()
    }
    want = {
        (r["a_id"], r["b_id"])
        for r in la.crossJoin(rb)
        .filter(
            (F.col("a_lo") <= F.col("b_hi")) & (F.col("b_lo") <= F.col("a_hi"))
        )
        .collect()
    }
    assert got == want and len(want) >= 40


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_presplit_exact_shards_above_2_53(spark, direction):
    """Epoch-nano-scale timestamps (longs above 2**53, where float64
    spacing is 256) must shard EXACTLY: the former double division
    could misplace rows across shard boundaries and silently change
    matches near them (r7 ADVICE).  Rows are packed tightly around
    shard boundaries at t0 ~ 2**60 so any misplacement flips a match;
    presplit must equal the plain operator row for row."""
    from flink_rtcef_spark.operators.joins import as_of_join_presplit

    t0 = 1 << 60
    span = 1000
    rng = np.random.default_rng(11)
    # left/right timestamps within +-3 of multiples of span around t0
    edges = t0 + rng.integers(0, 50, 200) * span
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 3, 200),
            "t": edges + rng.integers(-3, 4, 200),
            "lv": np.arange(200),
        }
    )
    redges = t0 + rng.integers(0, 50, 80) * span
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 3, 80),
            "t": redges + rng.integers(-3, 4, 80),
            "rv": rng.integers(0, 100, 80).astype("float64"),
        }
    ).drop_duplicates(["k", "t"])
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
    plain = (
        as_of_join(
            ldf, rdf, on="k", left_ts="t", right_cols=["rv"],
            direction=direction,
        )
        .toPandas().sort_values(["k", "t", "lv"]).reset_index(drop=True)
    )
    sharded = (
        as_of_join_presplit(
            ldf, rdf, on="k", shard_span=span, left_ts="t",
            right_cols=["rv"], direction=direction,
        )
        .toPandas().sort_values(["k", "t", "lv"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(sharded, plain)


def test_floor_div_exact_vs_python(spark):
    """_floor_div == Python // for integral columns across signs and
    magnitudes, including values float64 cannot represent."""
    from flink_rtcef_spark.operators.joins import _floor_div

    vals = [
        0, 1, -1, 999, -999, 1000, -1000, 1001, -1001,
        (1 << 60) + 1, (1 << 60) - 1, -(1 << 60) - 1,
        (1 << 62) + 257, -(1 << 62) - 257,
    ]
    for width in (7, 1000, 10**12):
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = {
            r["v"]: r["b"]
            for r in df.select(
                "v", _floor_div(F.col("v"), width, "bigint").alias("b")
            ).collect()
        }
        assert got == {v: v // width for v in vals}, width


def test_interval_overlap_join_left_matches_duckdb(spark):
    """how="left" == the all-pairs SQL LEFT JOIN: matched pairs
    identical to inner, plus exactly ONE null-extended row per
    unmatched left interval."""
    import duckdb

    from flink_rtcef_spark.operators.joins import interval_overlap_join

    la, rb = _interval_fixture(spark, n=150, seed=21)
    out = interval_overlap_join(
        la, rb, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=256,
        on="key", how="left",
    ).toPandas()
    con = duckdb.connect()
    con.register("la", la.toPandas())
    con.register("rb", rb.toPandas())
    want = con.execute(
        "SELECT a_id, b_id FROM la LEFT JOIN rb ON la.key = rb.key "
        "AND a_lo <= b_hi AND b_lo <= a_hi"
    ).df()
    got_pairs = sorted(
        (int(r.a_id), -1 if pd.isna(r.b_id) else int(r.b_id))
        for r in out.itertuples()
    )
    want_pairs = sorted(
        (int(r.a_id), -1 if pd.isna(r.b_id) else int(r.b_id))
        for r in want.itertuples()
    )
    assert got_pairs == want_pairs
    # some left rows genuinely unmatched, and each appears exactly once
    unmatched = out[out["b_id"].isna()]
    assert len(unmatched) > 0
    assert unmatched["a_id"].is_unique
    # exactly-once under left semantics: matched pairs == inner result
    inner = interval_overlap_join(
        la, rb, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=256, on="key"
    ).count()
    assert len(out) - len(unmatched) == inner


def test_interval_overlap_join_left_null_right_bounds_retained(spark):
    """An unmatched left interval keeps NULL right columns even when
    its span covers many bins (the null row must emit from exactly one
    copy — the first covered bin)."""
    from flink_rtcef_spark.operators.joins import interval_overlap_join

    la = spark.createDataFrame(
        [(1, 0, 5000), (2, 10_000, 10_050)], "a_id long, a_lo long, a_hi long"
    )
    rb = spark.createDataFrame(
        [(9, 100, 200)], "b_id long, b_lo long, b_hi long"
    )
    out = (
        interval_overlap_join(
            la, rb, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=64, how="left"
        )
        .toPandas()
        .sort_values("a_id")
        .reset_index(drop=True)
    )
    assert len(out) == 2
    assert out.loc[0, "b_id"] == 9
    assert pd.isna(out.loc[1, "b_id"]) and pd.isna(out.loc[1, "b_lo"])


def test_interval_overlap_join_how_guard(spark):
    from flink_rtcef_spark.operators.joins import interval_overlap_join

    la, rb = _interval_fixture(spark, n=5)
    with pytest.raises(ValueError, match="how"):
        interval_overlap_join(
            la, rb, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=64, how="full"
        )


def test_interval_overlap_join_no_nested_loop(spark, tmp_path):
    """The plan is an equi-join on the bin id — no BNLJ/cartesian."""
    from flink_rtcef_spark.operators.joins import interval_overlap_join

    la, rb = _interval_fixture(spark, n=50)
    la.write.parquet(str(tmp_path / "la"))
    rb.write.parquet(str(tmp_path / "rb"))
    la2, rb2 = spark.read.parquet(str(tmp_path / "la")), spark.read.parquet(
        str(tmp_path / "rb")
    )
    for how in ("inner", "left"):
        out = interval_overlap_join(
            la2, rb2, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=256,
            on="key", how=how,
        )
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "BroadcastNestedLoopJoin" not in plan, how
        assert "CartesianProduct" not in plan, how
