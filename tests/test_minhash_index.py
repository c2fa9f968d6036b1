"""Persisted MinHash/LSH index (operators/minhash_index.py):
increment-vs-history probes must have the same band-collision recall as
the batch chain, survive append replays, and close the incremental loop
to the batch answer on clique-shaped duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_rtcef_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    near_dedup,
)
from flink_rtcef_spark.operators.minhash_index import (
    incremental_near_dedup,
    minhash_index_append,
    minhash_index_meta,
    minhash_index_probe,
    minhash_index_write,
)

from .conftest import SF_ORACLE


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", "text"
    )


def test_probe_collisions_equal_batch_chain(spark, docs, tmp_path):
    """At threshold 0 the probe's (new, hist) pair set == the batch
    chain's candidate pairs restricted to cross pairs — the index stores
    the SAME band keys the self-join uses."""
    hist = docs.filter("doc_id % 4 != 0")
    new = docs.filter("doc_id % 4 = 0")
    idx = str(tmp_path / "idx")
    minhash_index_write(hist, idx)

    probed = {
        (r.new_id, r.hist_id)
        for r in minhash_index_probe(spark, new, idx, threshold=0.0).collect()
    }

    batch_pairs = lsh_candidate_pairs(minhash_signatures(docs)).collect()
    hist_ids = {r.doc_id for r in hist.collect()}
    new_ids = {r.doc_id for r in new.collect()}
    want = set()
    for r in batch_pairs:
        if r.id_a in new_ids and r.id_b in hist_ids:
            want.add((r.id_a, r.id_b))
        elif r.id_b in new_ids and r.id_a in hist_ids:
            want.add((r.id_b, r.id_a))
    assert probed == want
    assert want  # the fixture must actually have cross duplicates


def test_sig_estimate_bounds(spark, tmp_path):
    """Identical text estimates jaccard 1.0; unrelated text estimates
    low — the probe's est_jaccard is the MinHash agreement fraction."""
    hist = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again"),
         (2, "completely different content about maritime vessel trajectories")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog again and again"),
         (11, "unrelated third text on histogram sketches and bloom filters")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    minhash_index_write(hist, idx)
    got = {
        (r.new_id, r.hist_id): r.est_jaccard
        for r in minhash_index_probe(spark, new, idx, threshold=0.0).collect()
    }
    assert got[(10, 1)] == 1.0
    assert (11, 1) not in got or got[(11, 1)] < 0.5
    # threshold filters
    hits = minhash_index_probe(spark, new, idx, threshold=0.9).collect()
    assert {(r.new_id, r.hist_id) for r in hits} == {(10, 1)}


def test_incremental_loop_matches_batch_on_cliques(spark, tmp_path):
    """Three increments processed through probe+append reproduce the
    batch near_dedup of the whole corpus when duplicate groups are
    near-identical cliques (est- and exact-Jaccard agree far from the
    threshold) and arrival order is id order (keep-first == keep-min)."""
    base = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven twelve",
        "spark catalyst tungsten shuffle broadcast partition codegen arrow",
        "maritime vessel port anchorage heading speed draught destination",
        "histogram quantile sketch bloom filter minhash signature band",
    ]
    rows = []
    for i, t in enumerate(base):
        for c in range(3):  # 3 near-identical copies across batches
            doc_id = c * 100 + i
            text = t if c == 0 else t + f" tail{c}"
            rows.append((doc_id, text))
    # unique docs, one per batch
    for c in range(3):
        rows.append((c * 100 + 50, f"unique document number {c} with payload "
                                   f"{'x' * c} content entirely its own {c}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    batch_survivors = {
        r.doc_id for r in near_dedup(docs, threshold=0.5).collect()
    }

    idx = str(tmp_path / "idx")
    b0 = docs.filter("doc_id < 100")
    # batch 0 bootstraps the history: within-batch near_dedup only
    incr_survivors = {r.doc_id for r in near_dedup(b0, threshold=0.5).collect()}
    # (re-)write index from the batch-0 survivors so history == survivors
    minhash_index_write(docs.filter(
        F.col("doc_id").isin(*incr_survivors)), idx)

    for c in (1, 2):
        b = docs.filter(f"doc_id >= {c * 100} and doc_id < {(c + 1) * 100}")
        surv = incremental_near_dedup(spark, b, idx, threshold=0.5)
        ids = {r.doc_id for r in surv.collect()}
        incr_survivors |= ids
        minhash_index_append(surv, idx)

    assert incr_survivors == batch_survivors


def test_append_replay_changes_nothing(spark, docs, tmp_path):
    hist = docs.filter("doc_id % 4 != 0").limit(100)
    new = docs.filter("doc_id % 4 = 0").limit(50)
    idx = str(tmp_path / "idx")
    minhash_index_write(hist, idx)
    before = sorted(
        map(tuple, minhash_index_probe(spark, new, idx, 0.0).collect())
    )
    minhash_index_append(hist, idx)  # replayed append: duplicate rows
    after = sorted(
        map(tuple, minhash_index_probe(spark, new, idx, 0.0).collect())
    )
    assert before == after


def test_meta_pins_params_and_format(spark, docs, tmp_path):
    import json

    idx = str(tmp_path / "idx")
    minhash_index_write(docs.limit(20), idx, n_hashes=8, bands=2, seed=13)
    m = minhash_index_meta(idx)
    assert (m["n_hashes"], m["bands"], m["seed"]) == (8, 2, 13)
    with open(f"{idx}/_index_meta.json", "w") as fh:
        json.dump({"format": 99}, fh)
    with pytest.raises(ValueError, match="format"):
        minhash_index_meta(idx)


def test_probe_and_append_column_overrides(spark, tmp_path):
    """An increment frame with different column names than the index
    meta works through probe/append/incremental via the overrides."""
    hist = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    minhash_index_write(hist, idx)
    new = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog again and again"),
         (11, "completely unrelated content about something else entirely")],
        "id long, body string",
    )
    hits = minhash_index_probe(
        spark, new, idx, 0.9, text_col="body", id_col="id"
    ).collect()
    assert {(r.new_id, r.hist_id) for r in hits} == {(10, 1)}
    surv = incremental_near_dedup(
        spark, new, idx, 0.9, text_col="body", id_col="id"
    )
    assert {r.id for r in surv.collect()} == {11}
    minhash_index_append(surv, idx, text_col="body", id_col="id")
    # the appended doc is now history; its self-pair is excluded by the
    # doc_id != new_id guard, so the hit set is unchanged
    again = minhash_index_probe(
        spark, new, idx, 0.9, text_col="body", id_col="id"
    ).collect()
    assert {(r.new_id, r.hist_id) for r in again} == {(10, 1)}
