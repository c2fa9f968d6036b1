"""Scale-step bench for the three claim-critical paths: batch CEP,
the minhash->LSH->Jaccard->components dedup chain, and ExactSubstr.

The x10 point (docs/BENCH_SF1.md) pinned one decade of scaling for the
whole registry; this tool adds a second decade (x100: 10M events, 500k
documents from ``make_scaled_sf.py ... 100 events,documents``) for the
paths whose 100 TB story carries the most weight.  Same methodology as
bench.py: warm-up run, then median of 3.

Usage: python tools/bench_x100.py [sf_dir]   # default /tmp/sf100_scaled
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100_scaled"
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

    # -- batch CEP: same pattern + harness as the cep_sdfa_detect
    # headline row (uncached parquet read each run, like the registry)
    pat = (
        ";(IsEventTypePredicate(view),IsEventTypePredicate(click),"
        "IsEventTypePredicate(purchase)){partitionBy:user_id}"
    )
    decls = (
        "~(IsEventTypePredicate(view),IsEventTypePredicate(click),"
        "IsEventTypePredicate(purchase))"
    )
    compiled = compile_pattern(pat, decls)
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    cep = BatchCEP(compiled, ts_col="ts", id_col="event_id")
    dt = _median3(lambda: cep.detections(ev).count())
    out["cep_events"] = n_events
    note("cep_events")
    out["cep_sec"] = round(dt, 3)
    note("cep_sec")
    out["cep_events_per_sec"] = round(n_events / dt)
    note("cep_events_per_sec")

    # -- minhash -> LSH -> Jaccard -> connected-components chain
    # (near_dedup_transitive = the full production composition), plus
    # the first two stages alone so a super-linear stage is locatable
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    dt = _median3(
        lambda: minhash_signatures(docs, "text", "doc_id", 8, 3).count()
    )
    out["minhash_sec"] = round(dt, 3)
    note("minhash_sec")
    dt = _median3(
        lambda: lsh_candidate_pairs(
            minhash_signatures(docs, "text", "doc_id", 8, 3), "doc_id", 8, 4
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

    # -- ExactSubstr (cached input, matching bench.py's asof_fixture
    # harness so factors compare against the BENCH_SF1 row)
    cdocs = docs.cache()
    cdocs.count()
    dt = _median3(lambda: remove_duplicate_substrings(cdocs, k=20).count())
    cdocs.unpersist()
    out["exactsubstr_sec"] = round(dt, 3)
    note("exactsubstr_sec")
    out["exactsubstr_docs_per_sec"] = round(n_docs / dt)
    note("exactsubstr_docs_per_sec")

    # -- r4 additions: histogram quantiles (events), plain vs
    # bloom-prefiltered decontamination, MinHash-index increment probe
    from flink_rtcef_spark.operators.decontam import (
        contamination_hits,
        contamination_hits_bloom,
    )
    from flink_rtcef_spark.operators.minhash_index import (
        minhash_index_probe,
        minhash_index_write,
    )
    from flink_rtcef_spark.operators.sketch import hist_quantiles, hist_sketch

    dt = _median3(
        lambda: hist_quantiles(
            hist_sketch(ev, "value", 0.0, 512.0, 256, ["event_type"]),
            [0.5, 0.9, 0.99], 0.0, 512.0, 256, ["event_type"],
        ).count()
    )
    out["hist_quantiles_sec"] = round(dt, 3)
    note("hist_quantiles_sec")

    from pyspark.sql import functions as F

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

    # -- r5 additions: the remaining sketch family at a second decade
    # (HLL / KMV distinct estimation and CMS heavy hitters had only
    # x10 rows; the heavy-hitter candidate stage's 3.4x x10 factor
    # deserved a second decade per the r4 verdict)
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

    import tempfile

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

    print(json.dumps(out))


if __name__ == "__main__":
    main()
