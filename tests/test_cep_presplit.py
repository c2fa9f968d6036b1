"""Hot-key pre-split: time-range sharding with warm-up replay must
reproduce the unsharded SDFA run wherever a shard holds an exactness
certificate (first shard / reset in warm-up / state-map collapse)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from flink_rtcef_spark.operators.cep import BatchCEP
from flink_rtcef_spark.operators.cep_presplit import presplit_detections
from flink_rtcef_spark.plans.compiler import compile_pattern

_PATTERN = (
    ";(IsEventTypePredicate(view),IsEventTypePredicate(click),"
    "IsEventTypePredicate(purchase)){partitionBy:key}"
)
_DECLS = (
    "~(IsEventTypePredicate(view),IsEventTypePredicate(click),"
    "IsEventTypePredicate(purchase))"
)


def _events(spark, n_keys=3, n_per_key=400, types=("view", "click", "purchase", "error"), seed=11):
    rng = random.Random(seed)
    rows = []
    eid = 0
    for k in range(n_keys):
        for i in range(n_per_key):
            rows.append((f"k{k}", i * 10 + rng.randint(0, 3), eid, rng.choice(types)))
            eid += 1
    return spark.createDataFrame(
        rows, "key string, ts long, id long, event_type string"
    )


def _full_rows(df):
    cols = ["key", "detection_event_id", "detection_ts", "counter", "min_counter", "n_matched"]
    return sorted(tuple(r) for r in df.select(*cols).collect())


_PAIR_PATTERN = (
    ";(IsEventTypePredicate(view),IsEventTypePredicate(click)){partitionBy:key}"
)
_PAIR_DECLS = "~(IsEventTypePredicate(view),IsEventTypePredicate(click))"


def test_presplit_equals_unsharded_full_rows(spark):
    """Frequent-detection stream: every shard fully certifies (state map
    collapses AND a warm-up detection re-anchors the epoch accounting)
    and the full detection rows — absolute counters and match accounting
    included — match the unsharded kernel bit for bit."""
    compiled = compile_pattern(_PAIR_PATTERN, _PAIR_DECLS)
    ev = _events(spark, types=("view", "click", "purchase"))
    base = BatchCEP(compiled, key_col="key", ts_col="ts", id_col="id").detections(ev)
    split = presplit_detections(
        ev, compiled, shard_span=500, warmup=500, key_col="key", ts_col="ts",
        id_col="id", strict=True,
    )
    out = split.collect()
    assert len(out) > 0
    assert all(r.exact for r in out)
    assert _full_rows(split) == _full_rows(base)


def test_detection_points_exact_even_when_accounting_is_not(spark):
    """Sparse-detection stream (3-step pattern): some shards cannot
    re-anchor the epoch accounting inside the warm-up, and their rows are
    flagged exact=False — but detection identity (key, event, ts) and the
    absolute counter are state-certified and must still match."""
    compiled = compile_pattern(_PATTERN, _DECLS)
    ev = _events(spark)
    base = BatchCEP(compiled, key_col="key", ts_col="ts", id_col="id").detections(ev)
    split = presplit_detections(
        ev, compiled, shard_span=500, warmup=500, key_col="key", ts_col="ts",
        id_col="id", strict=True,
    )
    cols = ["key", "detection_event_id", "detection_ts", "counter"]
    assert sorted(map(tuple, split.select(*cols).collect())) == sorted(
        map(tuple, base.select(*cols).collect())
    )
    # full rows agree exactly on the shards that fully certify
    exact_rows = split.filter("exact")
    base_rows = _full_rows(base)
    assert set(_full_rows(exact_rows)) <= set(base_rows)


def test_presplit_parallelizes_one_hot_key(spark):
    """One pathological key: the sharded plan produces > 1 task-sized
    group and still matches the unsharded run."""
    compiled = compile_pattern(_PAIR_PATTERN, _PAIR_DECLS)
    ev = _events(spark, n_keys=1, n_per_key=2000, types=("view", "click", "purchase"), seed=5)
    base = BatchCEP(compiled, key_col="key", ts_col="ts", id_col="id").detections(ev)
    split = presplit_detections(
        ev, compiled, shard_span=2000, warmup=600, key_col="key", ts_col="ts",
        id_col="id",
    )
    n_shards = split.select("shard").distinct().count()
    assert n_shards > 5  # the single key now spreads over many groups
    assert _full_rows(split) == _full_rows(base)


def test_windowed_pattern_certifies_via_resets(spark):
    """Windowed patterns only certify through reset events (or first
    shards): a stream with periodic RESET control events stays exact."""
    compiled = compile_pattern(
        ";(IsEventTypePredicate(view),IsEventTypePredicate(click))"
        "{partitionBy:key}{window:5}",
        "+(IsEventTypePredicate(RESET))\n"
        "~(IsEventTypePredicate(view),IsEventTypePredicate(click),"
        "IsEventTypePredicate(RESET))",
    )
    rng = random.Random(3)
    rows = []
    for i in range(1200):
        # a reset at least once per warm-up span
        et = "RESET" if i % 17 == 0 else rng.choice(("view", "click", "other"))
        rows.append(("hot", i * 10, i, et))
    ev = spark.createDataFrame(rows, "key string, ts long, id long, event_type string")
    base = BatchCEP(compiled, key_col="key", ts_col="ts", id_col="id").detections(ev)
    split = presplit_detections(
        ev, compiled, shard_span=1000, warmup=400, key_col="key", ts_col="ts",
        id_col="id", strict=True,
    )
    assert _full_rows(split) == _full_rows(base)


def test_strict_raises_without_certificate(spark):
    """A windowed pattern with no reset events cannot certify any shard
    beyond each key's first: strict mode must fail loudly."""
    compiled = compile_pattern(
        ";(IsEventTypePredicate(view),IsEventTypePredicate(click))"
        "{partitionBy:key}{window:5}",
        "~(IsEventTypePredicate(view),IsEventTypePredicate(click))",
    )
    rng = random.Random(7)
    rows = [("hot", i * 10, i, rng.choice(("view", "click"))) for i in range(400)]
    ev = spark.createDataFrame(rows, "key string, ts long, id long, event_type string")
    split = presplit_detections(
        ev, compiled, shard_span=1000, warmup=500, key_col="key", ts_col="ts",
        id_col="id", strict=True,
    )
    with pytest.raises(Exception, match="certificate"):
        split.collect()


def test_certified_wrapper_exact_despite_uncertified_shards(spark):
    """presplit_detections_certified must equal the unsharded kernel on
    full rows even when many shards cannot certify (windowed pattern, no
    resets): uncertified keys are routed back through the serial path."""
    from flink_rtcef_spark.operators.cep_presplit import (
        presplit_detections_certified,
    )

    compiled = compile_pattern(
        ";(IsEventTypePredicate(view),IsEventTypePredicate(click))"
        "{partitionBy:key}{window:5}",
        "~(IsEventTypePredicate(view),IsEventTypePredicate(click))",
    )
    rng = random.Random(7)
    rows = [
        (f"k{j}", i * 10, i * 3 + j, rng.choice(("view", "click")))
        for j in range(3)
        for i in range(400)
    ]
    ev = spark.createDataFrame(rows, "key string, ts long, id long, event_type string")
    base = BatchCEP(compiled, key_col="key", ts_col="ts", id_col="id").detections(ev)
    cert = presplit_detections_certified(
        ev, compiled, shard_span=1000, warmup=500, key_col="key", ts_col="ts",
        id_col="id", require="full",
    )
    assert _full_rows(cert) == _full_rows(base)


def test_nonstrict_flags_uncertified_shards(spark):
    """Same stream, non-strict: later shards carry exact=False so the
    caller can quarantine them."""
    compiled = compile_pattern(
        ";(IsEventTypePredicate(view),IsEventTypePredicate(click))"
        "{partitionBy:key}{window:5}",
        "~(IsEventTypePredicate(view),IsEventTypePredicate(click))",
    )
    rng = random.Random(7)
    rows = [("hot", i * 10, i, rng.choice(("view", "click"))) for i in range(400)]
    ev = spark.createDataFrame(rows, "key string, ts long, id long, event_type string")
    split = presplit_detections(
        ev, compiled, shard_span=1000, warmup=500, key_col="key", ts_col="ts",
        id_col="id",
    )
    flags = {r.shard: r.exact for r in split.collect()}
    assert flags.get(0, True) is True  # first shard always exact
    assert any(v is False for s, v in flags.items() if s > 0)


def test_certified_windowed_routes_per_key_without_probe(spark):
    """Mixed stream, windowed pattern: the reset-bearing key certifies
    (sharded path), the reset-free key quarantines (serial path), the
    union equals the unsharded kernel — and the routing decision itself
    comes from the JVM-side pre-certification, checked directly."""
    from flink_rtcef_spark.operators.cep_presplit import (
        _windowed_uncertified_keys,
        presplit_detections_certified,
    )

    compiled = compile_pattern(
        ";(IsEventTypePredicate(view),IsEventTypePredicate(click))"
        "{partitionBy:key}{window:5}",
        "+(IsEventTypePredicate(RESET))\n"
        "~(IsEventTypePredicate(view),IsEventTypePredicate(click),"
        "IsEventTypePredicate(RESET))",
    )
    rng = random.Random(11)
    rows = []
    for i in range(1200):
        et = "RESET" if i % 17 == 0 else rng.choice(("view", "click", "other"))
        rows.append(("with_resets", i * 10, i * 2, et))
        rows.append(
            ("no_resets", i * 10, i * 2 + 1, rng.choice(("view", "click", "other")))
        )
    ev = spark.createDataFrame(rows, "key string, ts long, id long, event_type string")
    cep = BatchCEP(compiled, key_col="key", ts_col="ts", id_col="id")

    bad = _windowed_uncertified_keys(
        cep.symbolized(ev), 1000, 400, compiled.reset_symbols()
    )
    assert [r["key"] for r in bad.collect()] == ["no_resets"]

    cert = presplit_detections_certified(
        ev, compiled, shard_span=1000, warmup=400, key_col="key", ts_col="ts",
        id_col="id",
    )
    assert _full_rows(cert) == _full_rows(cep.detections(ev))


def test_presplit_colocation_survives_aqe_join_rewrite(spark):
    """Regression (r9): grouping must be CONTRACTUAL, not plan-shaped.

    The former repartition(key, shard) + sortWithinPartitions +
    mapInPandas walk had its user repartition elided by Catalyst (the
    offsets equi-join directly beneath already hash-partitions on the
    same keys) and AQE's broadcast-join conversion then local-read the
    orphaned join exchange — splitting a (key, shard) group across
    partitions, so a shard could lose its warm-up prefix entirely
    (observed at 500k single-key events: strict mode raised with a
    0-event warm-up).  This fixture reproduces that trigger: one hot
    key, enough rows that AQE converts the offsets join and rewrites
    the shuffle, strict certificates on.  It fails on any future
    regression to a distribution-assuming mapInPandas shape."""
    n = 500_000
    et = F.element_at(
        F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
        ((F.xxhash64("id") % 3 + 3) % 3 + 1).cast("int"),
    )
    et = F.when(F.col("id") % 500 == 0, F.lit("RESET")).otherwise(et)
    ev = spark.range(n).select(
        F.lit("hot").alias("key"),
        (F.col("id") * 10).alias("ts"),
        F.col("id"),
        et.alias("event_type"),
    )
    decls = (
        "+(IsEventTypePredicate(RESET))\n"
        "~(IsEventTypePredicate(view),IsEventTypePredicate(click),"
        "IsEventTypePredicate(RESET))"
    )
    pat = (
        ";(IsEventTypePredicate(view),IsEventTypePredicate(click))"
        "{partitionBy:key}{window:40}"
    )
    compiled = compile_pattern(pat, decls)
    span = n * 10 // 64
    split = presplit_detections(
        ev, compiled, shard_span=span, warmup=span // 8, key_col="key",
        ts_col="ts", id_col="id", strict=True,
    )
    plain = BatchCEP(compiled, key_col="key", ts_col="ts", id_col="id").detections(ev)
    assert split.count() == plain.count()
