"""End-to-end training-corpus curation — every pipeline stage in one
drive, on the synthetic documents/embeddings tables.

The stage order is the one that minimizes work at scale: cheap
map-side filters first (quality, language), then the digest-shuffle
dedups, then the n-gram decontamination, then mixing/packing — each
stage shrinks the corpus before the next pays its shuffle.

    profile -> boilerplate cut -> paragraph dedup (corpus-wide)
            -> quality + repetition gate -> perplexity filter
            -> learned classifier gate -> pii redaction -> exact dedup -> minhash-LSH near-dedup
            -> semantic near-dedup (SemDeDup) -> exact + fuzzy decontamination
            -> temperature mix -> chunk + FFD-pack
            -> deterministic shard export + partitioned write + profile
            (+ a BM25 search probe over the curated corpus)

Run: python examples/curation_pipeline.py [--sf-dir /root/testdata/sf0.01]
Prints one summary line per stage (rows in -> rows out) and the
before/after sketch profiles.
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from flink_rtcef_spark.operators.decontam import decontaminate, fuzzy_decontaminate
from flink_rtcef_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    semantic_dedup_pairs,
)
from flink_rtcef_spark.operators.export import shard_manifest, write_shards
from flink_rtcef_spark.operators.lm import perplexity_filter, unigram_perplexity
from flink_rtcef_spark.operators.pii import redacted_column
from flink_rtcef_spark.operators.quality_clf import (
    classifier_filter,
    train_quality_classifier,
)
from flink_rtcef_spark.operators.retrieval import bm25_topk
from flink_rtcef_spark.operators.profile import corpus_profile
from flink_rtcef_spark.operators.sampling import temperature_sample
from flink_rtcef_spark.operators.text import (
    chunk_documents,
    dedup_paragraphs,
    pack_sequences,
    quality_signals,
    remove_boilerplate_lines,
    repetition_signals,
)
from flink_rtcef_spark.session import get_spark
from flink_rtcef_spark.sources.bucketing import write_partitioned
from flink_rtcef_spark.sources.io import load_table


_stage_clock = [time.time()]


def stage(name: str, df, prev_n: int) -> int:
    # wall attributed to a stage = everything since the previous
    # stage's count() returned (plan build + this count) — the number
    # the BENCH_SF1 composed-chain row ranks stages by
    n = df.count()
    dt = time.time() - _stage_clock[0]
    print(f"  {name:<28} {prev_n:>6} -> {n:>6}  ({dt:6.1f}s)")
    _stage_clock[0] = time.time()
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    t0 = time.time()
    spark = get_spark("curation_pipeline")

    docs = load_table(spark, args.sf_dir, "documents")
    n = docs.count()
    print(f"corpus: {n} docs from {args.sf_dir}")
    prof = corpus_profile(docs).first()
    print(
        f"  profile: ~{prof['approx_distinct_texts']:.0f} distinct texts, "
        f"token p50/p99 = {prof['tokens_p5']}/{prof['tokens_p99']}"
    )

    # 0. web-ingest head: the same corpus arriving as a WARC crawl.
    # A small archive is synthesized from the first 40 docs (driver-
    # bounded fixture synthesis only — the source itself is the real
    # distributed reader), then the crawl gate runs: WARC parse ->
    # canonical-URL dedup (every page also appears under a tracking-
    # param variant) -> domain blocklist -> host PageRank prior.
    from flink_rtcef_spark.operators.web import (
        dedup_by_canonical_url,
        filter_domains,
    )
    from flink_rtcef_spark.operators.webgraph import pagerank
    from flink_rtcef_spark.queries.pipeline import host_graph_edges
    from flink_rtcef_spark.sources.warc import warc_responses_as_documents

    def _warc_rec(url: str, text: str) -> str:
        # real crawl payloads are HTML, not text: wrap each doc in
        # markup (+ script/style noise) so the extraction step below
        # has actual work to do
        html = (
            "<html><head><title></title><style>p{margin:0}</style>"
            f"<script>track();</script></head><body><p>{text}</p>"
            "<!-- footer --></body></html>"
        )
        body = f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n{html}"
        return (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n{body}\r\n\r\n"
        )

    recs = []
    sample_rows = docs.select("doc_id", "source", "text").limit(40).collect()
    for r in sample_rows:
        url = f"http://www.{r['source']}.example/doc/{r['doc_id']}"
        recs.append(_warc_rec(url, r["text"]))
        recs.append(_warc_rec(f"{url}?utm_source=feed&fbclid=x", r["text"]))
    warc_path = tempfile.mkdtemp(prefix="warc_") + "/crawl.warc"
    Path(warc_path).write_text("".join(recs), newline="")
    web = warc_responses_as_documents(spark, warc_path)
    n_raw = web.count()
    # strip markup down to visible text (map-only regexp chain); every
    # wrapped doc must come back as its exact original text
    from flink_rtcef_spark.operators.web import html_to_text

    web = web.withColumn("text", html_to_text("text"))
    originals = {r["text"] for r in sample_rows}
    n_recovered = web.filter(F.col("text").isin(list(originals))).count()
    assert n_recovered == n_raw, (n_recovered, n_raw)
    web = dedup_by_canonical_url(web, url_col="url")
    n_urldedup = web.count()
    web = filter_domains(web, ["src0.example"], mode="block", url_col="url")
    n_domains = web.count()
    print(
        f"  {'warc ingest gate':<28} {n_raw:>6} html-extracted -> "
        f"{n_urldedup} url-deduped -> {n_domains} after domain block"
    )
    edges = host_graph_edges(spark, args.sf_dir).withColumn(
        "w", (F.abs(F.hash("src", "dst")) % 5 + 1).cast("double")
    )  # weighted variant: link strength differentiates the hosts
    ranks = pagerank(edges, n_iter=5, weight="w")
    top = ranks.orderBy(F.desc("rank"), "node").limit(3).collect()
    print(
        "  host pagerank prior          top: "
        + ", ".join(f"{t['node']} ({t['rank']:.6f})" for t in top)
    )

    # 0c. temporal feature join: every document enriched with the most
    # recent per-host PageRank SNAPSHOT at its crawl time — the as-of
    # join shape (snapshots recompute periodically, docs arrive
    # continuously; an equi join against all snapshots would shuffle
    # |docs| x |snapshots| rows).  Composed query audited in
    # docs/PLAN_AUDIT.md §composed; docs crawled before the first
    # snapshot keep NULL rank (left semantics).
    from flink_rtcef_spark.queries.pipeline import pagerank_asof_enrich

    enriched = pagerank_asof_enrich(spark, args.sf_dir)
    cov = enriched.agg(
        F.count("*").alias("n"),
        F.count("host_rank").alias("ranked"),
        F.min(F.when(F.col("host_rank").isNotNull(), F.col("crawl_day"))).alias(
            "first_ranked_day"
        ),
    ).collect()[0]
    # docs before the first snapshot day (5) never carry a rank; docs
    # at/after day 25 always do (the day-25 snapshot is the full
    # graph; earlier snapshots are growing subsets, so a host can
    # legitimately be missing from them)
    assert cov["first_ranked_day"] == 5, cov
    assert enriched.filter(
        (F.col("crawl_day") < 5) & F.col("host_rank").isNotNull()
    ).count() == 0
    assert enriched.filter(
        (F.col("crawl_day") >= 25) & F.col("host_rank").isNull()
    ).count() == 0
    print(
        f"  {'pagerank as-of enrichment':<28} {cov['n']:>6} docs -> "
        f"{cov['ranked']} with a snapshot rank "
        f"({cov['n'] - cov['ranked']} pre-first-snapshot)"
    )

    # 1. boilerplate lines shared by >5% of docs
    docs = remove_boilerplate_lines(docs, max_df=max(5, n // 20)).join(
        load_table(spark, args.sf_dir, "documents").drop("text"), "doc_id"
    )
    n = stage("boilerplate line cut", docs, n)

    # 1a. ExactSubstr (Lee et al. 2022): cut >=20-token runs duplicated
    # anywhere in the corpus, keeping the globally first occurrence.
    # Runs at ANY alignment, so it catches what the block-aligned
    # paragraph dedup below can't.  Row count is unchanged (the cut is
    # within documents) -- report cut tokens instead.
    from flink_rtcef_spark.operators.substring import remove_duplicate_substrings

    docs = remove_duplicate_substrings(docs, k=20)
    cut_total = docs.agg(F.sum("n_cut_tokens")).first()[0] or 0
    docs = docs.drop("n_cut_tokens")
    print(f"  {'exact-substring cut (k=20)':<28} {n:>6} docs, {cut_total} tokens cut")

    # 1b. corpus-wide paragraph dedup (keep-first, 20-token blocks —
    # the fixture has no newline paragraphs); text is rewritten, other
    # columns ride along
    deduped = dedup_paragraphs(docs, block_tokens=20)
    n_cut = deduped.filter(F.col("n_kept") < F.col("n_paras")).count()
    docs = deduped.select("doc_id", "text").join(docs.drop("text"), "doc_id")
    print(f"  {'paragraph dedup':<28} {n:>6} docs, {n_cut} lost >=1 block")

    # 2. quality gate (map-side signals), incl. Gopher repetition cut
    q = quality_signals(docs)
    good_ids = q.filter(
        (F.col("n_words") >= 10) & (F.col("mean_word_len").between(2.0, 12.0))
    ).select("doc_id")
    docs = docs.join(good_ids, "doc_id", "left_semi")
    rep_ok = repetition_signals(docs).filter(
        (F.col("top_2gram_char_frac") < 0.20) & (F.col("dup_3gram_char_frac") < 0.60)
    ).select("doc_id")
    docs = docs.join(rep_ok, "doc_id", "left_semi")
    n = stage("quality + repetition gate", docs, n)

    # 2a. perplexity filter: score every doc under a corpus unigram LM,
    # drop the highest-perplexity 5% (the CCNet tail cut).  The score
    # table is persisted — it feeds the cut, the filter, AND the weak
    # labels below — and the gated corpus is materialized before the
    # iterative classifier training re-reads it (letting ml's fit
    # re-derive the whole upstream lineage per pass is how demo
    # pipelines OOM; a production run writes the gated corpus to
    # storage at exactly this boundary)
    bits = unigram_perplexity(docs).persist()
    cut = bits.approxQuantile("ppl_bits", [0.95], 0.001)[0]
    docs = docs.join(
        bits.filter(F.col("ppl_bits") <= cut).select("doc_id"), "doc_id", "left_semi"
    )
    n = stage(f"perplexity tail cut (<{cut:.2f}b)", docs, n)
    docs = docs.localCheckpoint(eager=True)

    # 2a'. learned quality gate: train the fasttext-style classifier on
    # the lowest-vs-highest perplexity deciles as weak labels, keep
    # docs scoring > 0.3 (demo threshold; production uses a held-out
    # reference slice as the positive class)
    lo = bits.approxQuantile("ppl_bits", [0.1, 0.9], 0.001)
    pos_ids = bits.filter(F.col("ppl_bits") <= lo[0]).select("doc_id")
    neg_ids = bits.filter(F.col("ppl_bits") >= lo[1]).select("doc_id")
    clf = train_quality_classifier(
        docs.join(pos_ids, "doc_id", "left_semi"),
        docs.join(neg_ids, "doc_id", "left_semi"),
    )
    docs = classifier_filter(docs, clf, min_prob=0.3)
    n = stage("classifier quality gate", docs, n)

    # 2b. PII scrub (map-only: rewrite text in place)
    docs = docs.withColumn("text", redacted_column("text"))
    n = stage("pii redaction", docs, n)

    # 3. exact dedup (digest shuffle)
    docs = exact_dedup(docs).drop("n_copies")
    n = stage("exact dedup", docs, n)


    # 4. near-dedup: minhash -> banded LSH -> connected components ->
    # keep the LONGEST copy of each duplicate cluster (exemplar
    # selection on a quality score, not keep-min-id)
    from flink_rtcef_spark.operators.dedup import (
        connected_components,
        keep_best_in_component,
    )

    pairs = lsh_candidate_pairs(minhash_signatures(docs))
    comps = connected_components(pairs)
    docs = keep_best_in_component(
        docs.withColumn("__len", F.length("text")), comps, "__len"
    ).drop("__len")
    n = stage("minhash-LSH near-dedup", docs, n)

    # 4b. semantic near-dedup (SemDeDup): cluster the embedding space,
    # drop docs whose vector has a lower-id twin in the same cluster
    # (vec_id aligns 1:1 with doc_id in the fixture)
    emb = load_table(spark, args.sf_dir, "embeddings")
    sem_drop = (
        semantic_dedup_pairs(emb, n_clusters=8, threshold=0.45)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    docs = docs.join(F.broadcast(sem_drop), "doc_id", "left_anti")
    n = stage("semantic near-dedup", docs, n)

    # 5. decontamination against a held-out "benchmark" slice: exact
    # 13-gram pass, then the paraphrase-robust fuzzy (minhash-Jaccard)
    # pass over what survives
    benchmark = load_table(spark, args.sf_dir, "documents").filter(
        F.col("doc_id") % 97 == 0
    )
    docs = decontaminate(docs.filter(F.col("doc_id") % 97 != 0), benchmark, n=8)
    n = stage("benchmark decontamination", docs, n)
    docs = fuzzy_decontaminate(docs, benchmark, threshold=0.5)
    n = stage("fuzzy decontamination", docs, n)

    # 6. temperature mixing over the language column
    docs = temperature_sample(docs, "lang", "doc_id", alpha=0.5)
    n = stage("temperature mix (lang^0.5)", docs, n)

    # 6b. repetition budget on the TRAINING-SEQUENCE path: high-value
    # sources repeat for extra epochs (expected copies == weight;
    # map-side explode, no shuffle).  The corpus `docs` itself stays
    # deduplicated — epochs exist only in the packed sequences.
    from flink_rtcef_spark.operators.sampling import epoch_upsample

    train_docs = epoch_upsample(
        docs, {"src1": 2.0, "src3": 1.5}, "source", "doc_id", seed=11
    )
    n_train = train_docs.count()
    print(f"  {'epoch upsample (src1 x2, src3 x1.5)':<28} {n:>6} -> {n_train:>6}")

    # 7. chunk long docs, pack chunks to a 512-token budget (the id
    # carries the epoch so repeated docs pack as distinct sequences)
    chunks = chunk_documents(
        train_docs.select(
            (F.col("doc_id") * 8 + F.col("epoch")).alias("doc_id"), "text"
        ),
        chunk_tokens=128,
        stride=128,
    )
    packed = pack_sequences(
        chunks.select(
            (F.col("doc_id") * 10000 + F.col("chunk_idx")).alias("chunk_id"),
            F.col("n_chunk_tokens").alias("n_tokens"),
        ),
        budget=512,
        id_col="chunk_id",
        tokens_col="n_tokens",
    )
    n_packs = packed.select("pack_id").distinct().count()
    print(f"  {'chunk + FFD pack':<28} {n_train:>6} -> {n_packs:>6} packs")

    # 7b. deterministic shard export: balanced, reproducible training
    # shards + the manifest a consumer checks before reading
    shard_dir = tempfile.mkdtemp(prefix="shards_")
    write_shards(docs, shard_dir, n_shards=4)
    manifest = shard_manifest(docs, n_shards=4).orderBy("shard").collect()
    m_str = ", ".join(f"s{r['shard']}={r['n_docs']}" for r in manifest)
    print(f"  {'shard export (4)':<28} {m_str} -> {shard_dir}")

    # 7c. search probe over the curated corpus
    hits = bm25_topk(docs, ["spark", "join", "stream"], k=3).collect()
    top = ", ".join(f"doc {r['doc_id']} ({r['score']:.2f})" for r in hits)
    print(f"  {'bm25 probe':<28} spark/join/stream -> {top}")

    # 7c2. leakage-safe train/val/test split: any near-dup pair still in
    # the curated corpus (candidates under the dedup threshold) must not
    # straddle the eval boundary — split per CLUSTER and audit to zero
    from flink_rtcef_spark.operators.splits import (
        leakage_safe_split,
        split_leakage,
    )

    residual_pairs = lsh_candidate_pairs(minhash_signatures(docs))
    assigned = leakage_safe_split(
        docs, residual_pairs, (("train", 0.9), ("val", 0.05), ("test", 0.05))
    )
    by = {r["split"]: r["count"] for r in assigned.groupBy("split").count().collect()}
    leaked = split_leakage(assigned, residual_pairs).count()
    split_str = ", ".join(f"{k}={by.get(k, 0)}" for k in ("train", "val", "test"))
    print(f"  {'leakage-safe split':<28} {split_str}; straddling pairs = {leaked}")

    # 7d. model-free embedding probe: hash-project the curated text and
    # cluster by mutual kNN (swap in a real encoder column and nothing
    # downstream changes)
    from flink_rtcef_spark.operators.embed import hashed_text_embedding
    from flink_rtcef_spark.operators.similarity import cluster_by_knn

    emb = hashed_text_embedding(docs, dim=64).withColumnRenamed(
        "doc_id", "vec_id"
    )
    comp = cluster_by_knn(emb, k=3, threshold=0.8)
    n_comp = comp.select("component").distinct().count()
    print(f"  {'hashed-embed knn clusters':<28} {comp.count()} docs -> {n_comp} clusters")

    # 8. partitioned write + final profile
    out = tempfile.mkdtemp(prefix="curated_")
    write_partitioned(docs, out, "lang")
    curated = spark.read.parquet(out)
    final = corpus_profile(curated).first()
    print(
        f"  final: {final['rows']} docs, "
        f"~{final['approx_distinct_texts']:.0f} distinct texts, "
        f"token p50/p99 = {final['tokens_p5']}/{final['tokens_p99']}"
    )

    # 9. day-2 increment: the MATERIALIZED curated corpus becomes
    # HISTORY (a banded MinHash index — a few hundred bytes/doc, no
    # text), and a simulated next-day crawl (half repeats with edits,
    # half new) is near-deduped against it with one broadcast probe —
    # the 100 TB history is read once per increment and never shuffled.
    # Built from the parquet output, not the in-session lineage: index
    # construction is a new scan, it must not re-run the whole chain.
    from flink_rtcef_spark.operators.minhash_index import (
        incremental_near_dedup,
        minhash_index_append,
        minhash_index_write,
    )

    idx = tempfile.mkdtemp(prefix="mh_index_")
    minhash_index_write(curated.select("doc_id", "text"), idx)
    repeats = (
        curated.orderBy("doc_id").limit(40)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" crawl-dup tail")).alias("text"))
    )
    fresh = curated.orderBy(F.desc("doc_id")).limit(40).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.lit("entirely new day-two page "),
                 F.reverse(F.col("text"))).alias("text"),
    )
    day2 = repeats.unionByName(fresh)
    # materialize once: count() and the append below both consume the
    # dedup lineage (minhash + LSH self-join + index probe)
    surv = incremental_near_dedup(spark, day2, idx, threshold=0.5).localCheckpoint()
    n_day2, n_surv = day2.count(), surv.count()
    minhash_index_append(surv, idx)
    print(f"  {'day-2 increment vs index':<28} {n_day2:>6} -> {n_surv:>6}")
    assert n_surv < n_day2  # the re-crawled half must be dropped

    print(f"# curated corpus at {out}; wall {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
