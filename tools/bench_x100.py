"""Scale-step bench for the three claim-critical paths: batch CEP,
the minhash->LSH->Jaccard->components dedup chain, and ExactSubstr.

The x10 point (docs/BENCH_SF1.md) pinned one decade of scaling for the
whole registry; this tool adds a second decade (x100: 10M events, 500k
documents from ``make_scaled_sf.py ... 100 events,documents``) for the
paths whose 100 TB story carries the most weight.  Same methodology as
bench.py: warm-up run, then median of 3.

Usage: python tools/bench_x100.py [sf_dir] [sections]
``sections`` (optional) is a comma list among
cep,dedup,substr,hist,decontam,sketch,index,joins — default all.
Run it against /root/testdata/sf0.1 and /tmp/sf1_scaled too to compute
factors on one consistent harness.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flink_rtcef_spark.session import get_spark


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _median3(fn) -> float:
    fn()  # warm-up: plan compile + shuffle files + python workers
    return statistics.median(_timed(fn) for _ in range(3))


_ALL_SECTIONS = (
    "cep", "dedup", "substr", "hist", "decontam", "sketch", "index", "joins"
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100_scaled"
    sections = (
        set(sys.argv[2].split(",")) if len(sys.argv) > 2 else set(_ALL_SECTIONS)
    )
    unknown = sections - set(_ALL_SECTIONS)
    if unknown:
        raise SystemExit(f"unknown sections {sorted(unknown)}; "
                         f"known: {_ALL_SECTIONS}")

    def want(s: str) -> bool:
        return s in sections

    spark = get_spark("bench_x100")

    from flink_rtcef_spark.operators.cep import BatchCEP
    from flink_rtcef_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        near_dedup_transitive,
    )
    from flink_rtcef_spark.operators.substring import (
        remove_duplicate_substrings,
    )
    from flink_rtcef_spark.plans.compiler import compile_pattern
    from flink_rtcef_spark.sources.io import load_table

    out: dict = {"sf_dir": sf_dir}

    def note(k):
        print(f"# {k} = {out[k]}", flush=True)

    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    docs = n_docs = None
    if sections & {"dedup", "substr", "decontam", "sketch", "index"}:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        n_docs = docs.count()

    if want("cep"):
        # -- batch CEP: same pattern + harness as the cep_sdfa_detect
        # headline row (uncached parquet read each run, like the
        # registry)
        pat = (
            ";(IsEventTypePredicate(view),IsEventTypePredicate(click),"
            "IsEventTypePredicate(purchase)){partitionBy:user_id}"
        )
        decls = (
            "~(IsEventTypePredicate(view),IsEventTypePredicate(click),"
            "IsEventTypePredicate(purchase))"
        )
        compiled = compile_pattern(pat, decls)
        n_events = ev.count()
        cep = BatchCEP(compiled, ts_col="ts", id_col="event_id")
        dt = _median3(lambda: cep.detections(ev).count())
        out["cep_events"] = n_events
        note("cep_events")
        out["cep_sec"] = round(dt, 3)
        note("cep_sec")
        out["cep_events_per_sec"] = round(n_events / dt)
        note("cep_events_per_sec")

    if want("dedup"):
        # -- minhash -> LSH -> Jaccard -> connected-components chain
        # (near_dedup_transitive = the full production composition),
        # plus the first two stages alone so a super-linear stage is
        # locatable
        dt = _median3(
            lambda: minhash_signatures(docs, "text", "doc_id", 8, 3).count()
        )
        out["minhash_sec"] = round(dt, 3)
        note("minhash_sec")
        dt = _median3(
            lambda: lsh_candidate_pairs(
                minhash_signatures(docs, "text", "doc_id", 8, 3),
                "doc_id", 8, 4,
            ).count()
        )
        out["lsh_pairs_sec"] = round(dt, 3)
        note("lsh_pairs_sec")
        dt = _median3(lambda: near_dedup_transitive(docs).count())
        out["dedup_docs"] = n_docs
        note("dedup_docs")
        out["dedup_chain_sec"] = round(dt, 3)
        note("dedup_chain_sec")
        out["dedup_chain_docs_per_sec"] = round(n_docs / dt)
        note("dedup_chain_docs_per_sec")

    if want("substr"):
        # -- ExactSubstr (cached input, matching bench.py's asof_fixture
        # harness so factors compare against the BENCH_SF1 row)
        cdocs = docs.cache()
        cdocs.count()
        dt = _median3(
            lambda: remove_duplicate_substrings(cdocs, k=20).count()
        )
        cdocs.unpersist()
        out["exactsubstr_sec"] = round(dt, 3)
        note("exactsubstr_sec")
        out["exactsubstr_docs_per_sec"] = round(n_docs / dt)
        note("exactsubstr_docs_per_sec")

    if want("hist"):
        # -- r4 addition: histogram quantiles (events)
        from flink_rtcef_spark.operators.sketch import (
            hist_quantiles,
            hist_sketch,
        )

        dt = _median3(
            lambda: hist_quantiles(
                hist_sketch(ev, "value", 0.0, 512.0, 256, ["event_type"]),
                [0.5, 0.9, 0.99], 0.0, 512.0, 256, ["event_type"],
            ).count()
        )
        out["hist_quantiles_sec"] = round(dt, 3)
        note("hist_quantiles_sec")

    if want("decontam"):
        # -- r4 addition: plain vs bloom-prefiltered decontamination
        from flink_rtcef_spark.operators.decontam import (
            contamination_hits,
            contamination_hits_bloom,
        )

        corpus = docs.filter(F.col("doc_id") % 5 != 0)
        benchm = docs.filter(F.col("doc_id") % 5 == 0)
        dt = _median3(lambda: contamination_hits(corpus, benchm, n=8).count())
        out["decontam_plain_sec"] = round(dt, 3)
        note("decontam_plain_sec")
        dt = _median3(
            lambda: contamination_hits_bloom(
                corpus, benchm, n=8, bloom_m=1 << 20, bloom_k=4
            ).count()
        )
        out["decontam_bloom_sec"] = round(dt, 3)
        note("decontam_bloom_sec")

    if want("sketch"):
        # -- r5 additions: the remaining sketch family at a second
        # decade (HLL / KMV distinct estimation and CMS heavy hitters
        # had only x10 rows; the heavy-hitter candidate stage's 3.4x
        # x10 factor deserved a second decade per the r4 verdict)
        from flink_rtcef_spark.operators.sketch import (
            approx_heavy_hitters,
            hll_distinct,
            kmv_sketch,
        )

        dt = _median3(lambda: hll_distinct(docs, "text").count())
        out["hll_distinct_sec"] = round(dt, 3)
        note("hll_distinct_sec")
        dt = _median3(lambda: kmv_sketch(docs, "text").count())
        out["kmv_sec"] = round(dt, 3)
        note("kmv_sec")
        words = docs.select(
            F.explode(F.split(F.lower("text"), "\\s+")).alias("word")
        ).filter(F.length("word") > 0)
        dt = _median3(
            lambda: approx_heavy_hitters(words, "word", min_share=0.01).count()
        )
        out["heavy_hitters_words_sec"] = round(dt, 3)
        note("heavy_hitters_words_sec")

    if want("index"):
        # -- r4 addition: MinHash-index increment probe
        import tempfile

        from flink_rtcef_spark.operators.minhash_index import (
            minhash_index_probe,
            minhash_index_write,
        )

        hist_side = docs.filter("doc_id % 25 != 0")
        increment = docs.filter("doc_id % 25 = 0")
        n_inc = increment.count()
        idx = tempfile.mkdtemp(prefix="x100_idx_")
        t0 = time.perf_counter()
        minhash_index_write(hist_side, idx)
        out["index_build_sec"] = round(time.perf_counter() - t0, 3)
        note("index_build_sec")
        dt = _median3(
            lambda: minhash_index_probe(spark, increment, idx, 0.5).count()
        )
        out["index_probe_docs"] = n_inc
        out["index_probe_sec"] = round(dt, 3)
        note("index_probe_sec")
        out["index_probe_docs_per_sec"] = round(n_inc / dt)
        note("index_probe_docs_per_sec")

    if not want("joins"):
        print(json.dumps(out))
        return

    # -- r6 additions: the temporal joins promoted to oracle queries
    # this round (as-of, binned range, interval-overlap).  The scaled
    # fixture shifts user_id/o_custkey per copy, so key count grows
    # with scale while per-key density stays constant — the honest
    # weak-scaling shape for a single-shuffle-per-join design (the
    # failure mode to catch would be bin fan-out or window-sort cost
    # growing super-linearly).
    from flink_rtcef_spark.operators.joins import (
        as_of_join,
        interval_overlap_join,
        range_join_binned,
    )

    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.unix_millis("ts").alias("t_ms"))
        .agg(F.max("value").alias("click_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_millis("ts").alias("ts_ms")
    )
    n_purch = purchases.count()
    dt = _median3(
        lambda: as_of_join(
            purchases, clicks, on="user_id", left_ts="ts_ms",
            right_ts="t_ms", right_cols=["click_value"],
        ).count()
    )
    out["asof_rows"] = n_purch
    note("asof_rows")
    out["asof_sec"] = round(dt, 3)
    note("asof_sec")
    out["asof_rows_per_sec"] = round(n_purch / dt)
    note("asof_rows_per_sec")

    # -- r7: the hot-key cliff (verdict item 4).  The merge-scan as-of
    # windows over partitionBy(key): ONE key owning a large row share
    # (a celebrity user at 100 TB) serializes that key's whole
    # timeline into a single task.  Remap ~25% of both sides onto one
    # key (>>100x the median user's density) and measure the plain
    # operator against the time-sharded presplit variant (1-day
    # shards), which spreads the hot key over timeline/shard tasks.
    from flink_rtcef_spark.operators.joins import as_of_join_presplit

    def _hot(df, mod, hits):
        # remap hits/mod of the key space onto one key
        return df.withColumn(
            "user_id",
            F.when(
                F.crc32(F.col("user_id").cast("string")) % mod < hits,
                F.lit(-1),
            ).otherwise(F.col("user_id")),
        )

    for tag, mod, hits in (("hot25", 4, 1), ("hot90", 10, 9)):
        hot_p, hot_c = _hot(purchases, mod, hits), _hot(clicks, mod, hits)
        hot_rows = hot_p.filter(F.col("user_id") == -1).count()
        dt = _median3(
            lambda: as_of_join(
                hot_p, hot_c, on="user_id", left_ts="ts_ms",
                right_ts="t_ms", right_cols=["click_value"],
            ).count()
        )
        out[f"asof_skew_{tag}_left_rows"] = hot_rows
        note(f"asof_skew_{tag}_left_rows")
        out[f"asof_skew_{tag}_plain_sec"] = round(dt, 3)
        note(f"asof_skew_{tag}_plain_sec")
        dt = _median3(
            lambda: as_of_join_presplit(
                hot_p, hot_c, on="user_id", shard_span=86_400_000,
                left_ts="ts_ms", right_ts="t_ms",
                right_cols=["click_value"],
            ).count()
        )
        out[f"asof_skew_{tag}_presplit_sec"] = round(dt, 3)
        note(f"asof_skew_{tag}_presplit_sec")

    points = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_millis("ts").alias("t_ms")
    )
    ivals = purchases.select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts_ms").alias("lo"),
        (F.col("ts_ms") + F.lit(21600000)).alias("hi"),
    )
    dt = _median3(
        lambda: range_join_binned(
            points, ivals, "t_ms", "lo", "hi",
            bin_width=21600000, on="user_id",
        ).count()
    )
    out["range_join_sec"] = round(dt, 3)
    note("range_join_sec")

    orders = load_table(spark, sf_dir, "orders")
    n_orders = orders.count()

    def _iv(side):
        o = load_table(spark, sf_dir, "orders")
        lo = F.unix_millis("o_orderdate")
        return o.select(
            F.col("o_orderkey").alias(f"{side}_orderkey"), "o_custkey",
            lo.alias(f"{side}_lo"),
            (lo + F.lit(604800000)).alias(f"{side}_hi"),
        )

    dt = _median3(
        lambda: interval_overlap_join(
            _iv("a"), _iv("b"), "a_lo", "a_hi", "b_lo", "b_hi",
            bin_width=604800000, on="o_custkey",
        ).filter(F.col("a_orderkey") < F.col("b_orderkey")).count()
    )
    out["overlap_orders"] = n_orders
    note("overlap_orders")
    out["overlap_join_sec"] = round(dt, 3)
    note("overlap_join_sec")
    out["overlap_orders_per_sec"] = round(n_orders / dt)
    note("overlap_orders_per_sec")

    # -- r9 (r8 verdict #3): decade rows for the surfaces r8 shipped
    # with parity tests only — presplit direction="nearest", the
    # GLOBAL (on=None) as-of, and interval_overlap_join(how="left").
    # nearest doubles the right side's presence in the merged order
    # (backward + forward candidate per row), so its premium over
    # backward is the thing to watch per decade.
    dt = _median3(
        lambda: as_of_join(
            purchases, clicks, on="user_id", left_ts="ts_ms",
            right_ts="t_ms", right_cols=["click_value"],
            direction="nearest",
        ).count()
    )
    out["asof_nearest_plain_sec"] = round(dt, 3)
    note("asof_nearest_plain_sec")
    dt = _median3(
        lambda: as_of_join_presplit(
            purchases, clicks, on="user_id", shard_span=86_400_000,
            left_ts="ts_ms", right_ts="t_ms", right_cols=["click_value"],
            direction="nearest",
        ).count()
    )
    out["asof_nearest_presplit_sec"] = round(dt, 3)
    note("asof_nearest_presplit_sec")

    # GLOBAL as-of (on=None): the whole dataset is ONE timeline, so
    # the plain operator's window serializes every row into a single
    # task — the presplit's time shards are the documented scale path
    # for exactly this case, and this pair MEASURES that claim: the
    # plain wall grows with total rows on one core while the presplit
    # spreads the timeline over (rows/shard_span) tasks.
    dt = _median3(
        lambda: as_of_join(
            purchases, clicks, on=None, left_ts="ts_ms",
            right_ts="t_ms", right_cols=["click_value"],
        ).count()
    )
    out["asof_global_plain_sec"] = round(dt, 3)
    note("asof_global_plain_sec")
    dt = _median3(
        lambda: as_of_join_presplit(
            purchases, clicks, on=None, shard_span=86_400_000,
            left_ts="ts_ms", right_ts="t_ms", right_cols=["click_value"],
        ).count()
    )
    out["asof_global_presplit_sec"] = round(dt, 3)
    note("asof_global_presplit_sec")

    dt = _median3(
        lambda: interval_overlap_join(
            _iv("a"), _iv("b"), "a_lo", "a_hi", "b_lo", "b_hi",
            bin_width=604800000, on="o_custkey", how="left",
        ).filter(
            F.col("b_orderkey").isNull()
            | (F.col("a_orderkey") < F.col("b_orderkey"))
        ).count()
    )
    out["overlap_left_join_sec"] = round(dt, 3)
    note("overlap_left_join_sec")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
