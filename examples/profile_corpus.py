"""Corpus profiling drive: the sketch/profile layer end-to-end.

What a data engineer runs FIRST against an unknown 100 TB corpus —
cheap, bounded-state statistics before committing to a curation run:

  distinct texts per (lang, source)   deterministic HLL vs exact
  heavy-hitter tokens                 CMS + sampled candidates
  shard-merge check                   sketch(A) + sketch(B) == sketch(A|B)
  token-length quantiles              KLL (JVM Datasketches)
  train/val/test preview              leakage-safe split + audit

Usage: python examples/profile_corpus.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from flink_rtcef_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures
from flink_rtcef_spark.operators.profile import length_quantiles
from flink_rtcef_spark.operators.sketch import (
    approx_heavy_hitters,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)
from flink_rtcef_spark.operators.splits import leakage_safe_split, split_leakage
from flink_rtcef_spark.session import get_spark
from flink_rtcef_spark.sources.io import load_table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    t0 = time.time()
    spark = get_spark("profile_corpus")
    docs = load_table(spark, args.sf_dir, "documents")

    # 1. distinct texts per lang: HLL estimate next to the exact count
    est = hll_distinct(docs, "text", ["lang"])
    exact = docs.groupBy("lang").agg(F.countDistinct("text").alias("exact"))
    rows = est.join(exact, "lang").orderBy("lang").collect()
    worst = max(abs(r["hll_distinct"] - r["exact"]) / max(r["exact"], 1) for r in rows)
    print(f"# hll distinct per lang ({len(rows)} groups), worst rel err "
          f"{worst:.3f}:")
    for r in rows[:5]:
        print(f"  {r['lang']:<6} hll={r['hll_distinct']:<10} exact={r['exact']}")

    # 2. heavy-hitter tokens (>= 1% of all tokens), no distinct shuffle
    # — the candidate coin needs a ROW id (doc, position) so a heavy
    # token gets one independent chance per occurrence
    words = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), "\\s+")).alias("pos", "w"),
    ).filter(F.length("w") > 0).withColumn(
        "tok_id", F.col("doc_id") * 100000 + F.col("pos")
    )
    hh = approx_heavy_hitters(
        words, "w", min_share=0.01, candidate_rate=0.2, id_col="tok_id"
    )
    top = hh.orderBy(F.desc("share")).limit(5).collect()
    print("# heavy tokens (cms): "
          + ", ".join(f"{r['w']} ({r['share']:.3f})" for r in top))

    # 3. shard-merge invariant: profile halves independently, merge
    a = hll_registers(docs.filter("doc_id % 2 = 0"), "text", ["lang"])
    b = hll_registers(docs.filter("doc_id % 2 = 1"), "text", ["lang"])
    merged = hll_estimate(hll_merge(a, b), ["lang"])
    whole = hll_distinct(docs, "text", ["lang"])
    diff = merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
    print(f"# shard-merge check: merge(sketch A, sketch B) == sketch(A|B): "
          f"{'OK' if diff == 0 else f'MISMATCH ({diff})'}")
    assert diff == 0

    # 3b. corpus overlap via KMV digests: two ingest batches sharing
    # sources — union / intersection / Jaccard from two k-row sketches
    from flink_rtcef_spark.operators.sketch import kmv_overlap_estimates, kmv_sketch

    batch_a = docs.filter("doc_id % 3 != 0")
    batch_b = docs.filter("doc_id % 3 != 1")  # ~1/3 of docs shared
    est = kmv_overlap_estimates(
        kmv_sketch(batch_a, "text", k=256), kmv_sketch(batch_b, "text", k=256),
        k=256,
    )
    print(
        f"# kmv overlap A~B: union~{est['union']:.0f} "
        f"intersection~{est['intersection']:.0f} jaccard~{est['jaccard']:.2f}"
    )

    # 4. token-length quantiles, twice: KLL (JVM-native, fast,
    # non-reproducible outside Spark) next to the auditable
    # histogram sketch (cross-engine-exact; error <= one bin width)
    with_tokens = docs.withColumn(
        "n_tokens", F.size(F.split(F.lower("text"), "\\s+"))
    )
    q = length_quantiles(with_tokens, "n_tokens", [0.5, 0.9, 0.99]).first()
    print(f"# token p50/p90/p99 (kll): {q[0]}/{q[1]}/{q[2]}")
    from flink_rtcef_spark.operators.sketch import hist_quantiles, hist_sketch

    hsk = hist_sketch(with_tokens, "n_tokens", 0.0, 512.0, 256)
    hq = {
        r["q"]: r["quantile_est"]
        for r in hist_quantiles(hsk, [0.5, 0.9, 0.99], 0.0, 512.0, 256).collect()
    }
    print(f"# token p50/p90/p99 (hist): "
          f"{hq[0.5]:.1f}/{hq[0.9]:.1f}/{hq[0.99]:.1f}")
    for est_v, kll_v in zip((hq[0.5], hq[0.9], hq[0.99]), q):
        assert abs(est_v - kll_v) <= 4.0, (est_v, kll_v)  # 2 bins + kll err

    # 4b. membership prefilter preview: how much of the corpus a
    # benchmark bloom would drop before the exact decontam join
    from flink_rtcef_spark.operators.decontam import ngram_hash_sets
    from flink_rtcef_spark.operators.sketch import bloom_build, bloom_filter_members

    bench_grams = (
        ngram_hash_sets(docs.filter("doc_id % 5 = 0"), "doc_id", "text", 8)
        .select("gram_hash").distinct()
    )
    corpus_grams = ngram_hash_sets(docs.filter("doc_id % 5 <> 0"), "doc_id", "text", 8)
    bloom = bloom_build(bench_grams, "gram_hash", 1 << 15, 4, prehashed=True)
    n_all = corpus_grams.count()
    n_pass = bloom_filter_members(
        corpus_grams, "gram_hash", bloom, 1 << 15, 4, prehashed=True
    ).count()
    print(f"# bloom prefilter: {n_all} corpus grams -> {n_pass} "
          f"({100 * n_pass / max(n_all, 1):.2f}%) reach the exact join")

    # 5. split preview with leakage audit over LSH near-dup pairs
    pairs = lsh_candidate_pairs(minhash_signatures(docs))
    assigned = leakage_safe_split(docs, pairs)
    by = {r["split"]: r["count"] for r in assigned.groupBy("split").count().collect()}
    leaked = split_leakage(assigned, pairs).count()
    print("# split preview: "
          + ", ".join(f"{k}={by.get(k, 0)}" for k in ("train", "val", "test"))
          + f"; straddling near-dup pairs = {leaked}")
    assert leaked == 0

    print(f"# profile complete; wall {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
