"""Temporal join operators Spark lacks as built-ins: as-of join and a
binned range join.

The reference's evaluation joins are equi+interval shapes
(ClassificationForecastCollector.scala:76-145 — covered by
queries/relational.interval_join_eval); feature pipelines over a 100 TB
event corpus additionally need the *as-of* shape (enrich each fact row
with the most recent dimension state at or before its timestamp) and
point-in-interval joins WITHOUT an equi key.  Naive Spark plans for
both are scale-killers: a per-key self-join explodes on key fan-out,
and a pure range predicate becomes BroadcastNestedLoopJoin (O(n*m)).

Scale design (100 TB):
- ``as_of_join`` is ONE shuffle on the join key + one within-partition
  sort (union both sides, window ``last``/``first`` over the merged
  order) — the distributed equivalent of a merge-scan as-of, with cost
  O((|L|+|R|) log) and shuffle payload of only the key, timestamp, and
  the carried right columns.  No join blow-up: each left row emits
  exactly one output row regardless of how many right rows precede it.
  Skew bound: the window partitions by the join KEY, so one hot key's
  whole timeline sorts inside a single task — fine until that one
  task's sort dominates the stage (measured: a key owning 500k of 2M
  rows adds nothing at local[32]; the cliff needs a single key's rows
  to exceed roughly one executor-core's sort throughput x stage wall).
  For hotter keys use ``as_of_join_presplit``, which shards each key's
  timeline into fixed time ranges (same two-phase idea as the CEP
  hot-key path) at the cost of one tiny extra shuffle.
- ``range_join_binned`` rewrites point-in-interval into an EQUI join on
  a bin id (each interval replicated to the bins it covers, each point
  mapped to its single bin) + a residual filter — a hash shuffle whose
  fan-out is interval_span/bin_width, instead of a nested loop over
  the whole table.  The same rewrite Databricks' range-join hint
  performs, expressed with public DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_MATCH = "__asof_match"
_SIDE = "__asof_side"

_INTEGRAL = ("tinyint", "smallint", "int", "bigint")


def _floor_div(col: Column, width: int, dtype: str) -> Column:
    """``floor(col / width)`` computed EXACTLY in 64-bit integers for
    EVERY numeric dtype.

    ``F.floor(col / lit(width))`` divides as float64, which loses
    integer resolution above 2**53 — epoch-micro/nano timestamps (plain
    longs, so they pass the numeric-dtype guard) can land in the wrong
    shard/bin near boundaries and silently change join results.
    Integral columns: subtract ``pmod`` to reach the largest multiple
    of ``width`` at or below the value, then integer-divide — an exact
    multiple makes truncating ``div`` equal floor, all in 64-bit
    integer arithmetic (an earlier decimal(38,0) formulation was exact
    too but cost ~35% on the binned-join queries).  Fractional columns
    go through ``floor(col)`` (bigint, exact for |value| < 2**63) and
    then the SAME integer path — valid because
    ``floor(x/w) == floor(floor(x)/w)`` for integer ``w > 0``.  One
    shared arithmetic matters when an operator mixes dtypes: an r8
    ADVICE probe showed double-floor bins and exact-long bins of the
    SAME instant can disagree by several bins above 2**53, so an
    integral side and a fractional side would never equi-join near
    boundaries.  Bounds: the pmod subtraction wraps for values within
    ``width`` of LONG_MIN, and fractional values at or beyond 2**63
    overflow the bigint cast to NULL (dropping the row from
    sequence/explode) — both five-plus orders of magnitude beyond any
    epoch-nano timestamp."""
    w = F.lit(width)
    if dtype not in _INTEGRAL:
        col = F.floor(col)
    return F.call_function("div", col - F.pmod(col, w), w)


def _make_bin(width: int, *dtypes: str):
    """Bin-id function over a COMMON comparison space for an operator
    whose participating numeric columns have the given dtypes.

    When every column is integral, bins use the exact 64-bit path of
    :func:`_floor_div` directly.  When ANY column is fractional, Spark
    evaluates the operator's residual comparisons by coercing the
    integral side to double — so bins must live in that same coerced
    space, or an integral-side bin computed exactly and a
    fractional-side bin computed on float64 can disagree by several
    bins above 2**53 and the pair never equi-joins (r8 ADVICE, probed:
    a long lo at 2**60+1003 bins to ...4797 exactly while the double
    the predicate compares it to is 2**60+1024, bin ...4800).  Each
    column is coerced to double FIRST (identical to the predicate's
    coercion) and then binned exactly on that coerced value, making
    the binned join's matches equal the raw-predicate join's for every
    dtype mix; the integer-resolution loss above 2**53 in the mixed
    case is Spark's own comparison semantics, not an artifact of the
    binning."""
    exact = all(d in _INTEGRAL for d in dtypes)

    def bin_(col: Column, dtype: str) -> Column:
        if exact:
            return _floor_div(col, width, dtype)
        if dtype in _INTEGRAL:
            col = col.cast("double")
        return _floor_div(col, width, "double")

    return bin_


def _right_side_tag(direction: str, allow_exact: bool) -> int:
    """Sort tag for right rows in the merged order (left rows are
    always 1): equal-timestamp matching is purely a question of
    whether a right row sorts inside the left row's window frame.
    Backward frame is (unbounded preceding, current): right sorts
    BEFORE left (0) to include equal timestamps, AFTER (2) to exclude
    them.  Forward frame is (current, unbounded following): the
    mirror."""
    if direction == "backward":
        return 0 if allow_exact else 2
    return 2 if allow_exact else 0


def _asof_sides(left, right, keys, left_ts, rts, right_cols, direction,
                allow_exact=True):
    """Shared as-of prologue: the right side reduced to (keys, __t,
    payload struct, side tag) and the left side widened with the same
    columns — the merged-order encoding both the plain and the
    presplit operators window over.  Returns (l, r, right_cols).
    Left rows always carry side tag 1."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*keys, rts)]
    payload = F.struct(
        F.col(rts).cast(dict(right.dtypes)[rts]).alias("__ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(rts).alias("__t"),
        payload.alias(_MATCH),
        F.lit(_right_side_tag(direction, allow_exact)).alias(_SIDE),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__t"),
        F.lit(None).cast(r.schema[_MATCH].dataType).alias(_MATCH),
        F.lit(1).alias(_SIDE),
    )
    return l, r, right_cols


def _asof_finish(out, left, right_cols, rts, suffix, tolerance, direction):
    """Shared as-of epilogue: tolerance masking + the carried-columns
    select with suffix collision handling."""
    if tolerance is not None:
        in_tol = (
            F.col(f"{_MATCH}.__ts") >= F.col("__t") - tolerance
            if direction == "backward"
            else F.col(f"{_MATCH}.__ts") <= F.col("__t") + tolerance
        )
        out = out.withColumn(_MATCH, F.when(in_tol, F.col(_MATCH)))
    left_names = set(left.columns)
    carried = [
        F.col(f"{_MATCH}.__ts").alias(rts + suffix),
        *[
            F.col(f"{_MATCH}.{c}").alias(c + suffix if c in left_names else c)
            for c in right_cols
        ],
    ]
    return out.select(*[F.col(c) for c in left.columns], *carried)


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] | None,
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | int | float | None = None,
    suffix: str = "_right",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For every left row, the single right row with the nearest
    ``right_ts`` at-or-before (``backward``) / at-or-after (``forward``)
    / on either side (``nearest``, distance ties to the backward match
    as in pandas) the row's ``left_ts``, within the same ``on`` key.

    ``on=None`` is the GLOBAL as-of (pandas ``merge_asof`` without
    ``by``): one shared timeline.  Here the window has no partition
    key, so the merged sort runs in a single task — fine for
    dimension-sized inputs; for a large global timeline use
    :func:`as_of_join_presplit` with ``on=None``, whose time shards
    ARE the parallelism.

    Matches pandas ``merge_asof`` semantics (inclusive match at equal
    timestamps; unmatched rows keep NULL right columns) and DuckDB's
    ``ASOF LEFT JOIN`` (pinned in tests/test_joins_asof.py).
    ``allow_exact_matches=False`` excludes equal-timestamp right rows
    (strictly-before/strictly-after), exactly as in ``merge_asof`` —
    implemented purely in the merged order's tie-break tag, so the
    plan shape is unchanged.

    ``right_cols`` — right payload columns to carry (default: all
    non-key, non-timestamp columns).  Carried columns are renamed with
    ``suffix`` when they collide with a left column; the matched right
    timestamp is always exposed as ``right_ts + suffix``.

    ``tolerance`` bounds the match distance: a numeric value for
    numeric timestamps, or an INTERVAL Column for TIMESTAMP columns
    (e.g. ``F.expr("INTERVAL 5 MINUTES")``).  A match farther than the
    tolerance is dropped (NULLs), exactly as in ``merge_asof``.

    The matched right columns ride in ONE struct through the window
    function, so a right row whose payload column is legitimately NULL
    still wins the match (a per-column ``last(ignorenulls)`` would skip
    it and stitch together columns from different right rows).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    keys = [] if on is None else [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts
    if direction == "nearest":
        return _as_of_join_nearest(
            left, right, keys, left_ts, rts, right_cols, tolerance, suffix,
            allow_exact_matches,
        )
    l, r, right_cols = _asof_sides(
        left, right, keys, left_ts, rts, right_cols, direction,
        allow_exact_matches,
    )
    merged = l.unionByName(r.select(*keys, "__t", _MATCH, _SIDE), allowMissingColumns=True)

    # backward: eligible right rows sort BEFORE left rows (see
    # _right_side_tag for the equal-__t tie-break), matched by last()
    # over (unbounded preceding, current); forward: AFTER, matched by
    # first() over (current, unbounded following)
    w = W.partitionBy(*keys).orderBy("__t", _SIDE)
    if direction == "backward":
        frame = w.rowsBetween(W.unboundedPreceding, W.currentRow)
        matched = F.last(_MATCH, ignorenulls=True).over(frame)
    else:
        frame = w.rowsBetween(W.currentRow, W.unboundedFollowing)
        matched = F.first(_MATCH, ignorenulls=True).over(frame)

    out = merged.withColumn(_MATCH, matched).filter(F.col(_SIDE) == 1)
    return _asof_finish(out, left, right_cols, rts, suffix, tolerance, direction)


def _as_of_join_nearest(
    left, right, keys, left_ts, rts, right_cols, tolerance, suffix,
    allow_exact=True,
):
    """``direction="nearest"``: the closer of the backward and forward
    matches, distance ties to the backward one (pandas semantics,
    pinned by the merge_asof parity test).

    Same single shuffle + single sort as the directional paths: the
    right side enters the merged order TWICE — a backward-eligible
    copy sorting before left rows at equal __t (feeds a running
    ``last``) and a forward-eligible copy sorting after (feeds a
    running ``first``) — then the two candidates resolve per left row
    with a distance comparison.  Cost vs directional: the shuffle
    carries the right payload twice and the sort runs over |L|+2|R|
    rows; no extra shuffle or join."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*keys, rts)]
    payload = F.struct(
        F.col(rts).cast(dict(right.dtypes)[rts]).alias("__ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    ptype_cols = [F.col(k) for k in keys]
    rb = right.select(
        *ptype_cols, F.col(rts).alias("__t"),
        payload.alias("__mb"),
        F.lit(_right_side_tag("backward", allow_exact)).alias(_SIDE),
    )
    rf = right.select(
        *ptype_cols, F.col(rts).alias("__t"),
        payload.alias("__mf"),
        F.lit(_right_side_tag("forward", allow_exact)).alias(_SIDE),
    )
    null_payload = F.lit(None).cast(rb.schema["__mb"].dataType)
    l = left.select(
        "*",
        F.col(left_ts).alias("__t"),
        null_payload.alias("__mb"),
        null_payload.alias("__mf"),
        F.lit(1).alias(_SIDE),
    )
    merged = l.unionByName(
        rb, allowMissingColumns=True
    ).unionByName(rf, allowMissingColumns=True)

    w = W.partitionBy(*keys).orderBy("__t", _SIDE)
    bwd = F.last("__mb", ignorenulls=True).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = F.first("__mf", ignorenulls=True).over(
        w.rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    out = (
        merged.withColumn("__b", bwd)
        .withColumn("__f", fwd)
        .filter(F.col(_SIDE) == 1)
    )
    dist_b = F.col("__t") - F.col("__b.__ts")
    dist_f = F.col("__f.__ts") - F.col("__t")
    chosen = (
        F.when(F.col("__b").isNull(), F.col("__f"))
        .when(F.col("__f").isNull(), F.col("__b"))
        .when(dist_b <= dist_f, F.col("__b"))  # tie -> backward (pandas)
        .otherwise(F.col("__f"))
    )
    out = out.withColumn(_MATCH, chosen)
    if tolerance is not None:
        # two-sided bound (works for numeric ts AND timestamp+INTERVAL,
        # where an abs() over the difference would not)
        in_tol = (
            F.col(f"{_MATCH}.__ts") >= F.col("__t") - tolerance
        ) & (F.col(f"{_MATCH}.__ts") <= F.col("__t") + tolerance)
        out = out.withColumn(_MATCH, F.when(in_tol, F.col(_MATCH)))
    return _asof_finish(out, left, right_cols, rts, suffix, None, "backward")


def as_of_join_presplit(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] | None,
    shard_span: int,
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | int | float | None = None,
    suffix: str = "_right",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Hot-key-safe :func:`as_of_join`: same semantics, but each key's
    merged timeline is SHARDED into contiguous ``shard_span``-wide time
    ranges so one hot key (a celebrity user at 100 TB) parallelizes
    over its shards instead of serializing into a single window task —
    the same presplit idea as the CEP hot-key path
    (operators/cep_presplit.py), with a much simpler warm-up because
    as-of state is just "the last right payload so far".

    Two phases:

    1. within (key, shard): the plain merged-order window.  A left
       row's shard-local match, when present, IS the global match —
       any right row between the local candidate and the left row lies
       in the same contiguous time shard by construction.
    2. carry-in for rows with no shard-local match: per (key, shard),
       ONE aggregate row holds the shard's last (backward; first for
       forward) right payload; a window over those per-shard rows (at
       most timeline_span/shard_span rows per key — tiny) gives each
       shard the latest payload of all EARLIER shards, joined back on
       (key, shard).

    ``direction="nearest"`` composes both: phase 1 computes the
    shard-local backward AND forward candidates (the right side enters
    the merged order twice, as in the plain nearest path), phase 2
    carries the last backward edge and the first forward edge per
    shard, and each left row resolves
    ``coalesce(local, carried)`` per direction by distance (ties to
    backward, pandas semantics) — so the hot-key escape hatch covers
    the full :func:`as_of_join` direction surface.

    Cost vs the unsharded join: one extra shuffle of the per-shard
    aggregate (rows = touched shards, not events) + the carry-in
    equi-join on (key, shard) — both negligible; the win is that the
    expensive window's partition key becomes (key, shard).  Pick
    ``shard_span`` so a hot key's densest shard fits a task (e.g. one
    day of a user's events).

    ``on=None`` (global as-of, pandas ``merge_asof`` without ``by``)
    is where this operator earns its keep even WITHOUT skew: the plain
    global as-of sorts the whole merged timeline in one task, while
    here the time shards are the partition key — the single global
    timeline parallelizes across the cluster.

    Numeric timestamps only (``unix_millis`` first for TIMESTAMP
    columns — the shard id is ``floor(ts / shard_span)``, computed with
    exact integer arithmetic for integral columns so epoch-micro/nano
    longs above 2**53 shard exactly).  Duplicate right timestamps
    within one (key, shard): the carried pick is arbitrary among them,
    same as the plain operator's window (which takes whichever sorts
    last in partition order).
    """
    if shard_span <= 0:
        # floor(col/0) is NULL in Spark -> every row lands in a NULL
        # shard and the join silently degenerates
        raise ValueError(f"shard_span must be > 0, got {shard_span}")
    keys = [] if on is None else [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts
    for df, c in ((left, left_ts), (right, rts)):
        if dict(df.dtypes)[c] in ("timestamp", "timestamp_ntz", "date"):
            raise ValueError(
                f"as_of_join_presplit shards on floor({c!r} / shard_span) "
                f"and needs a numeric timestamp — convert with unix_millis "
                f"first (got {dict(df.dtypes)[c]})"
            )
    if direction == "nearest":
        return _as_of_presplit_nearest(
            left, right, keys, shard_span, left_ts, rts, right_cols,
            tolerance, suffix, allow_exact_matches,
        )
    backward = direction == "backward"
    l, r, right_cols = _asof_sides(
        left, right, keys, left_ts, rts, right_cols, direction,
        allow_exact_matches,
    )
    merged = l.unionByName(
        r.select(*keys, "__t", _MATCH, _SIDE), allowMissingColumns=True
    )
    ts_dtype = dict(merged.dtypes)["__t"]
    shard = _floor_div(F.col("__t"), shard_span, ts_dtype).alias("__shard")
    merged = merged.withColumn("__shard", shard)

    # phase 1: the merged-order window, partitioned by (key, shard)
    w = W.partitionBy(*keys, "__shard").orderBy("__t", _SIDE)
    if backward:
        frame = w.rowsBetween(W.unboundedPreceding, W.currentRow)
        local = F.last(_MATCH, ignorenulls=True).over(frame)
    else:
        frame = w.rowsBetween(W.currentRow, W.unboundedFollowing)
        local = F.first(_MATCH, ignorenulls=True).over(frame)
    out = merged.withColumn(_MATCH, local).filter(F.col(_SIDE) == 1)

    # phase 2: per-(key, shard) boundary payload -> carry across shards.
    # max_by/min_by on __t alone: the payload is carried, never
    # compared (a map-typed payload column would make a struct-ordered
    # max raise); ties at equal __t pick arbitrarily, exactly like the
    # unsharded window's partition-order last
    edge = (F.max_by if backward else F.min_by)(
        F.col(_MATCH), F.col("__t")
    ).alias("__edge")
    shard_edges = (
        r.withColumn("__shard", shard).groupBy(*keys, "__shard").agg(edge)
    )
    # the carry window must also VISIT every shard the LEFT side
    # touches (a left shard with no right rows inherits the carry of
    # earlier shards — without its row the (key, shard) join below
    # would miss and wrongly yield NULL), so union left-touched shards
    # in as NULL edges first (one aggregated row per touched shard)
    left_shards = (
        merged.filter(F.col(_SIDE) == 1)
        .groupBy(*keys, "__shard")
        .agg(F.lit(None).cast(shard_edges.schema["__edge"].dataType).alias("__edge"))
    )
    # each (key, shard) group holds at most ONE non-NULL edge (one row
    # from shard_edges, possibly one NULL from left_shards), so
    # first(ignorenulls) merges them deterministically — and unlike
    # max/min it never orders the payload type
    all_edges = shard_edges.unionByName(left_shards).groupBy(
        *keys, "__shard"
    ).agg(F.first("__edge", ignorenulls=True).alias("__edge"))
    cw = W.partitionBy(*keys).orderBy("__shard")
    carry = (
        F.last("__edge", ignorenulls=True).over(
            cw.rowsBetween(W.unboundedPreceding, -1)
        )
        if backward
        else F.first("__edge", ignorenulls=True).over(
            cw.rowsBetween(1, W.unboundedFollowing)
        )
    )
    carries = all_edges.select(
        *keys, "__shard", carry.alias("__carry")
    )

    out = out.join(carries, [*keys, "__shard"], "left").withColumn(
        _MATCH, F.coalesce(F.col(_MATCH), F.col("__carry"))
    )
    return _asof_finish(out, left, right_cols, rts, suffix, tolerance, direction)


def _as_of_presplit_nearest(
    left, right, keys, shard_span, left_ts, rts, right_cols, tolerance,
    suffix, allow_exact=True,
):
    """``as_of_join_presplit(direction="nearest")``: the plain nearest
    encoding (right side enters the merged order twice — a
    backward-eligible copy feeding a running ``last`` and a
    forward-eligible copy feeding a running ``first``) with the window
    partitioned by (key, time-shard), plus a two-sided carry: per
    (key, shard) the LAST backward edge and FIRST forward edge, carried
    across shards in both directions.  A left row resolves
    ``coalesce(shard-local, carried)`` per direction, then picks by
    distance with ties to backward (pandas semantics).  Exactness
    argument per direction is the directional presplit's: a shard-local
    candidate is the global one by time contiguity, and when absent the
    carried edge is."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*keys, rts)]
    payload = F.struct(
        F.col(rts).cast(dict(right.dtypes)[rts]).alias("__ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    rb = right.select(
        *[F.col(k) for k in keys], F.col(rts).alias("__t"),
        payload.alias("__mb"),
        F.lit(_right_side_tag("backward", allow_exact)).alias(_SIDE),
    )
    rf = right.select(
        *[F.col(k) for k in keys], F.col(rts).alias("__t"),
        payload.alias("__mf"),
        F.lit(_right_side_tag("forward", allow_exact)).alias(_SIDE),
    )
    null_payload = F.lit(None).cast(rb.schema["__mb"].dataType)
    l = left.select(
        "*",
        F.col(left_ts).alias("__t"),
        null_payload.alias("__mb"),
        null_payload.alias("__mf"),
        F.lit(1).alias(_SIDE),
    )
    merged = l.unionByName(rb, allowMissingColumns=True).unionByName(
        rf, allowMissingColumns=True
    )
    ts_dtype = dict(merged.dtypes)["__t"]
    shard = _floor_div(F.col("__t"), shard_span, ts_dtype).alias("__shard")
    merged = merged.withColumn("__shard", shard)

    # phase 1: shard-local candidates from one (key, shard) window sort
    w = W.partitionBy(*keys, "__shard").orderBy("__t", _SIDE)
    bwd = F.last("__mb", ignorenulls=True).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = F.first("__mf", ignorenulls=True).over(
        w.rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    out = (
        merged.withColumn("__b", bwd)
        .withColumn("__f", fwd)
        .filter(F.col(_SIDE) == 1)
    )

    # phase 2: per-(key, shard) boundary payloads, both directions.
    # max_by/min_by on __t alone (payload carried, never compared —
    # map-typed payloads must not be struct-ordered); left-touched
    # shards union in as NULL edges so shard gaps still get carry rows
    shard_edges = (
        rb.withColumn("__shard", shard)
        .groupBy(*keys, "__shard")
        .agg(
            F.max_by(F.col("__mb"), F.col("__t")).alias("__eb"),
            F.min_by(F.col("__mb"), F.col("__t")).alias("__ef"),
        )
    )
    left_shards = (
        merged.filter(F.col(_SIDE) == 1)
        .groupBy(*keys, "__shard")
        .agg(
            null_payload.alias("__eb"),
            null_payload.alias("__ef"),
        )
    )
    all_edges = (
        shard_edges.unionByName(left_shards)
        .groupBy(*keys, "__shard")
        .agg(
            F.first("__eb", ignorenulls=True).alias("__eb"),
            F.first("__ef", ignorenulls=True).alias("__ef"),
        )
    )
    cw = W.partitionBy(*keys).orderBy("__shard")
    carry_b = F.last("__eb", ignorenulls=True).over(
        cw.rowsBetween(W.unboundedPreceding, -1)
    )
    carry_f = F.first("__ef", ignorenulls=True).over(
        cw.rowsBetween(1, W.unboundedFollowing)
    )
    carries = all_edges.select(
        *keys, "__shard", carry_b.alias("__cb"), carry_f.alias("__cf")
    )
    out = out.join(carries, [*keys, "__shard"], "left")

    b = F.coalesce(F.col("__b"), F.col("__cb"))
    f = F.coalesce(F.col("__f"), F.col("__cf"))
    dist_b = F.col("__t") - b["__ts"]
    dist_f = f["__ts"] - F.col("__t")
    chosen = (
        F.when(b.isNull(), f)
        .when(f.isNull(), b)
        .when(dist_b <= dist_f, b)  # tie -> backward (pandas)
        .otherwise(f)
    )
    out = out.withColumn(_MATCH, chosen)
    if tolerance is not None:
        # two-sided bound after the choose — equivalent to pandas'
        # choose-within-tolerance because the bound is symmetric (the
        # plain nearest path pins this; same argument here)
        in_tol = (
            F.col(f"{_MATCH}.__ts") >= F.col("__t") - tolerance
        ) & (F.col(f"{_MATCH}.__ts") <= F.col("__t") + tolerance)
        out = out.withColumn(_MATCH, F.when(in_tol, F.col(_MATCH)))
    return _asof_finish(out, left, right_cols, rts, suffix, None, "backward")


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bin_width: int,
    on: str | list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to every right interval containing its point
    (``right_lo <= left_point <= right_hi``), optionally within equal
    ``on`` keys — via an equi join on a bin id instead of the
    BroadcastNestedLoopJoin Catalyst would otherwise pick when no equi
    key exists.

    Each right interval is replicated to ``span/bin_width + 1`` bins
    (choose ``bin_width`` near the typical span so replication stays
    O(1)); each left point lands in exactly one bin, so no output
    dedup is needed.  ``how="left"`` keeps unmatched left rows.

    Numeric point/bound columns only (timestamps: convert with
    ``unix_millis`` first).  Bin ids use exact 64-bit integer
    arithmetic when every point/bound column is integral, so
    epoch-micro/nano longs above 2**53 bin exactly; a mixed
    integral/fractional column set bins (and matches) in Spark's own
    coerced-double comparison space instead (see :func:`_make_bin`) —
    identical results to the raw-predicate join in every case.
    """
    if bin_width <= 0:
        # floor(col/0) is NULL in Spark, which would silently drop
        # every row instead of erroring
        raise ValueError(f"bin_width must be > 0, got {bin_width}")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    ldt, rdt = dict(left.dtypes), dict(right.dtypes)
    bin_ = _make_bin(bin_width, ldt[left_point], rdt[right_lo], rdt[right_hi])
    lb = left.withColumn("__bin", bin_(F.col(left_point), ldt[left_point]))
    rb = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                bin_(F.col(right_lo), rdt[right_lo]),
                bin_(F.col(right_hi), rdt[right_hi]),
            )
        ),
    )
    cond = [lb["__bin"] == rb["__bin"]]
    cond += [lb[k] == rb[k] for k in keys]
    contains = (rb[right_lo] <= lb[left_point]) & (lb[left_point] <= rb[right_hi])
    if how == "inner":
        joined = lb.join(rb, cond, "inner").filter(contains)
    elif how == "left":
        joined = lb.join(rb, [*cond, contains], "left")
    else:
        raise ValueError(f"how must be inner|left, got {how!r}")
    right_out = [
        rb[c].alias(c if c not in left.columns else c + "_right")
        for c in right.columns
        if c not in keys
    ]
    return joined.select(*[lb[c] for c in left.columns], *right_out)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bin_width: int,
    on: str | list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join every pair of OVERLAPPING intervals (``left_lo <= right_hi
    AND right_lo <= left_hi``), optionally within equal ``on`` keys —
    the interval×interval complement of :func:`range_join_binned`.

    Without an equi key Catalyst would run this as a
    BroadcastNestedLoopJoin (all-pairs — the 100 TB killer).  Instead
    BOTH sides replicate to the fixed-width bins they cover and
    equi-join on the bin id.  An overlapping pair shares every bin of
    its intersection; to count it EXACTLY ONCE with no distinct pass,
    only the bin containing the intersection's START
    (``floor(greatest(lo_a, lo_b) / bin_width)``) emits the pair —
    every other shared bin drops it with a cheap filter.  Replication
    is span/bin_width + 1 per row: choose ``bin_width`` near the
    typical span.

    ``how="left"`` keeps unmatched left intervals with NULL right
    columns (API parity with :func:`range_join_binned`).  Because the
    LEFT side is replicated across bins here, left retention needs a
    per-left-row "matched anywhere?" signal: a synthetic row id rides
    through the explode, the overlap+once predicates move into the
    join condition, and a window over the id keeps matched rows as-is
    plus exactly ONE null-extended row (in the interval's first bin)
    for rows no copy of which matched.  Costs one extra shuffle (the
    id window) over the inner plan; matched pairs are bit-identical to
    ``how="inner"``.

    ``how="left"`` determinism assumption: the row id is
    ``monotonically_increasing_id()`` computed before the explode, so
    every bin copy of a left row agrees on it within one execution —
    but the id depends on the left input's partition layout.  If a
    shuffle-fetch failure forces Spark to RECOMPUTE the left scan
    between the join and window stages AND the left plan is
    nondeterministic (e.g. fed by a shuffle whose order isn't pinned),
    ids can be reassigned and null-extended rows duplicated/dropped.
    Parquet/file scans (the normal case) replay deterministically; for
    a nondeterministic left input, ``persist()``/``localCheckpoint()``
    it first so retries replay the same rows-to-ids assignment.

    Numeric bounds only (timestamps: ``unix_millis`` first); intervals
    are closed on both ends, matching the SQL BETWEEN-style oracle.
    Bin ids use exact 64-bit integer arithmetic when every bound
    column is integral; a mixed integral/fractional bound set bins
    (and matches) in Spark's coerced-double comparison space instead
    (see :func:`_make_bin`) — identical results to the raw-predicate
    join in every case.
    """
    if bin_width <= 0:
        # floor(col/0) is NULL -> sequence/explode silently drops every
        # row instead of erroring
        raise ValueError(f"bin_width must be > 0, got {bin_width}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    ldt, rdt = dict(left.dtypes), dict(right.dtypes)
    bin_ = _make_bin(
        bin_width, ldt[left_lo], ldt[left_hi], rdt[right_lo], rdt[right_hi]
    )
    lsrc = left
    if how == "left":
        # id + first-covered-bin computed BEFORE the explode, so every
        # bin copy of a left row agrees on them
        lsrc = left.withColumn(
            "__lid", F.monotonically_increasing_id()
        ).withColumn("__bin0", bin_(F.col(left_lo), ldt[left_lo]))
    lb = lsrc.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                bin_(F.col(left_lo), ldt[left_lo]),
                bin_(F.col(left_hi), ldt[left_hi]),
            )
        ),
    )
    rb = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                bin_(F.col(right_lo), rdt[right_lo]),
                bin_(F.col(right_hi), rdt[right_hi]),
            )
        ),
    )
    if how == "left":
        rb = rb.withColumn("__rhit", F.lit(True))
    cond = [lb["__bin"] == rb["__bin"]]
    cond += [lb[k] == rb[k] for k in keys]
    overlaps = (lb[left_lo] <= rb[right_hi]) & (rb[right_lo] <= lb[left_hi])
    # intersection-start bin == max of the two lo bins (floor-div is
    # monotone), each computed in the operator's shared bin space — so
    # the dedup bin always agrees with the covering bins, where a
    # greatest()-then-divide could use a different coercion than the
    # covering-bin computation and disagree above 2**53
    once = lb["__bin"] == F.greatest(
        bin_(lb[left_lo], ldt[left_lo]),
        bin_(rb[right_lo], rdt[right_lo]),
    )
    if how == "inner":
        joined = lb.join(rb, cond, "inner").filter(overlaps & once)
    else:
        joined = lb.join(rb, [*cond, overlaps, once], "left")
        # matched rows pass through; a left row NONE of whose bin
        # copies matched keeps exactly one null-extended row — the copy
        # in its first covered bin (window result must be projected
        # before the filter: Spark forbids windows inside WHERE)
        any_hit = F.max(rb["__rhit"]).over(W.partitionBy(lb["__lid"]))
        joined = joined.withColumn("__anyhit", any_hit).filter(
            rb["__rhit"].isNotNull()
            | (F.col("__anyhit").isNull() & (lb["__bin"] == lb["__bin0"]))
        )
    right_out = [
        rb[c].alias(c if c not in left.columns else c + "_right")
        for c in right.columns
        if c not in keys
    ]
    return joined.select(*[lb[c] for c in left.columns], *right_out)
