"""Bloom-decontamination WIN-CONDITION measurement: shuffle BYTES.

The blocked-bloom prefilter's designed regime (operators/sketch.py,
operators/decontam.py) is a benchmark gram set too large to broadcast:
the exact verify join then becomes a shuffle join, and WITHOUT the
prefilter EVERY corpus gram crosses the network — at 100 TB, the gram
volume (~1 row per corpus token) dwarfs the scan.  The bloom (a few
MB, broadcast regardless of the join threshold) drops ~all clean
grams map-side, so only true hits + the fp tail reach the shuffle.

Locally the r4 wall-clock comparison was a dead heat (both paths are
scan-bound at sf0.1 with a broadcastable bench set), so per the r4
verdict this tool measures the quantity the prefilter actually
optimizes: SHUFFLE BYTES, read from the Spark UI REST API
(/api/v1/.../stages, completed stages between run markers), in the
contrived regime — autoBroadcastJoinThreshold=-1, long documents so
gram volume >> scan volume, disjoint corpus/bench text so the hit
rate is low (the realistic decontamination shape).

Both variants produce THE SAME exact rows (asserted here), so the
bytes ratio is a pure plan-cost comparison.

Usage: python tools/bench_bloom_shuffle.py [n_docs] [repeat]
"""

from __future__ import annotations

import json
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flink_rtcef_spark.session import get_spark


def _ui_stages(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        return json.load(r)


def _shuffle_since(spark, last_stage: int) -> tuple[int, int, int]:
    """(sum shuffle write bytes, sum shuffle write records, max stage id)
    over completed stages newer than ``last_stage``."""
    stages = _ui_stages(spark)
    new = [s for s in stages if s["stageId"] > last_stage]
    by = sum(s.get("shuffleWriteBytes", 0) for s in new)
    rec = sum(s.get("shuffleWriteRecords", 0) for s in new)
    mx = max((s["stageId"] for s in stages), default=last_stage)
    return by, rec, mx


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    # the UI must be on: its REST API is where completed-stage shuffle
    # metrics live (get_spark disables it by default)
    spark = get_spark(
        "bench_bloom_shuffle", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    # the contrived regime: nothing broadcasts unless explicitly hinted
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    from pyspark.sql import functions as F

    from flink_rtcef_spark.operators.decontam import (
        contamination_hits,
        contamination_hits_bloom,
    )
    from flink_rtcef_spark.sources.io import load_table

    out: dict = {"n_corpus_docs": n_docs, "text_repeat": repeat}
    base = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    # long documents: repeat the text so gram volume >> scan volume
    long_docs = base.select(
        "doc_id",
        F.concat_ws(
            " ", F.array_repeat(F.col("text"), repeat)
        ).alias("text"),
    )
    # range filters, NOT limit(): CollectLimit collapses a cached input
    # to ONE partition, which lets the sort-merge join satisfy its
    # distribution with no Exchange at all — the measurement would
    # read 0 shuffled bytes for the wrong reason.  repartition keeps
    # both sides multi-partition like any real table.
    corpus = long_docs.filter(
        (F.col("doc_id") % 5 != 0) & (F.col("doc_id") < n_docs * 5 // 4)
    ).repartition(32)
    benchm = long_docs.filter(
        (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < n_docs // 2)
    ).repartition(8)
    n_corpus = corpus.cache().count()
    n_bench = benchm.cache().count()
    out["n_corpus_docs_actual"] = n_corpus
    out["n_bench_docs"] = n_bench

    # fresh plans per run: Spark reuses the shuffle files of an
    # already-collected DataFrame object (stages show as skipped, 0
    # bytes), which would make a re-collect measure nothing
    def plain():
        return contamination_hits(
            corpus, benchm, n=8, broadcast_bench=False
        )

    def bloom():
        return contamination_hits_bloom(
            corpus, benchm, n=8, bloom_m=1 << 20, bloom_k=4,
            broadcast_verify=False,
        )

    # exactness first (and warm-up): identical rows from both plans
    a = sorted(map(tuple, plain().collect()))
    b = sorted(map(tuple, bloom().collect()))
    assert a == b, "bloom-prefiltered result diverged from the plain join"
    out["hit_docs"] = len(a)

    # measured runs (warm): plain shuffle join vs bloom-prefiltered
    _, _, mark = _shuffle_since(spark, -1)
    plain().collect()
    by_p, rec_p, mark = _shuffle_since(spark, mark)
    bloom().collect()
    by_b, rec_b, mark = _shuffle_since(spark, mark)

    out["plain_shuffle_mb"] = round(by_p / 2**20, 2)
    out["plain_shuffle_records"] = rec_p
    out["bloom_shuffle_mb"] = round(by_b / 2**20, 2)
    out["bloom_shuffle_records"] = rec_b
    out["shuffle_bytes_ratio"] = round(by_p / max(1, by_b), 2)
    out["shuffle_records_ratio"] = round(rec_p / max(1, rec_b), 2)

    # the IRREDUCIBLE floor of any exact shuffle-verify plan: the true
    # hit gram rows plus the bench grams themselves must cross the
    # shuffle no matter how good the prefilter is — survivors close to
    # this floor mean the bloom removed ~everything removable
    from flink_rtcef_spark.operators.decontam import (
        _bench_gram_hashes,
        ngram_hash_sets,
    )

    bench_grams = _bench_gram_hashes(benchm, "text", 8)
    doc_grams = ngram_hash_sets(corpus, "doc_id", "text", 8)
    out["bench_gram_rows"] = bench_grams.count()
    out["true_hit_gram_rows"] = doc_grams.join(
        bench_grams.hint("broadcast"), "gram_hash"
    ).count()
    out["floor_records"] = out["bench_gram_rows"] + out["true_hit_gram_rows"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
