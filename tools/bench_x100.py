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

    print(json.dumps(out))


if __name__ == "__main__":
    main()
