"""Leakage-safe train/val/test splits (operators/splits.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_rtcef_spark.operators.splits import (
    DEFAULT_WEIGHTS,
    hash_split,
    leakage_safe_split,
    split_leakage,
    split_sql_case,
)

from .conftest import SF_ORACLE

WEIGHTS = (("train", 0.8), ("val", 0.1), ("test", 0.1))


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", "text"
    )


def test_hash_split_total_cover_and_determinism(spark, docs):
    a = hash_split(docs, WEIGHTS, seed=3)
    n = docs.count()
    # every row gets exactly one split, no NULLs, only declared names
    by = {r["split"]: r["count"] for r in a.groupBy("split").count().collect()}
    assert sum(by.values()) == n
    assert set(by) <= {"train", "val", "test"}
    # deterministic across recomputation
    b = hash_split(docs, WEIGHTS, seed=3)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # seeds decorrelate: some rows move
    c = hash_split(docs, WEIGHTS, seed=4)
    moved = (
        a.select("doc_id", "split")
        .join(c.select("doc_id", F.col("split").alias("s2")), "doc_id")
        .filter("split <> s2")
        .count()
    )
    assert moved > 0


def test_hash_split_proportions(spark):
    df = spark.range(20000).select(F.col("id").alias("doc_id"))
    by = {
        r["split"]: r["count"]
        for r in hash_split(df, WEIGHTS).groupBy("split").count().collect()
    }
    n = 20000
    assert abs(by["train"] / n - 0.8) < 0.02
    assert abs(by["val"] / n - 0.1) < 0.01
    assert abs(by["test"] / n - 0.1) < 0.01


def test_split_matches_duckdb_oracle(spark, docs):
    """The assignment is engine-portable: DuckDB computes the identical
    split for every document (same md5 coin, same CASE edges)."""
    got = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, WEIGHTS, seed=1).select("doc_id", "split").collect()
    }
    case = split_sql_case("CAST(doc_id AS VARCHAR)", WEIGHTS, seed=1)
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT doc_id, {case} AS split FROM "
            f"read_parquet('{SF_ORACLE}/documents.parquet')"
        ).fetchall()
    )
    assert got == want


def test_default_weights_normalized():
    names = [n for n, _ in DEFAULT_WEIGHTS]
    assert names == ["train", "val", "test"]


def _dup_fixture(spark):
    """60 clusters of 4 near-identical docs + 240 singletons, with the
    pair list covering each cluster as a CHAIN (0-1, 1-2, 2-3) so the
    transitive closure is exercised, not just cliques."""
    rows, pairs = [], []
    for c in range(60):
        base = 1000 + c * 10
        for j in range(4):
            rows.append((base + j, f"cluster {c} text variant {j}"))
            if j:
                pairs.append((base + j - 1, base + j))
    for s in range(240):
        rows.append((5000 + s, f"unique document {s}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    prs = spark.createDataFrame(pairs, "id_a long, id_b long")
    return docs, prs


def test_naive_split_leaks_clusters_dont(spark):
    docs, pairs = _dup_fixture(spark)
    naive = hash_split(docs, WEIGHTS, seed=0)
    leaked_naive = split_leakage(naive, pairs)
    # 60 chained clusters x 25 independent boundary coins: the naive
    # split leaks with probability ~1 - (0.8^3+0.1^3+0.1^3)^60 ~ 1
    assert leaked_naive.agg(F.sum("n_leaked_pairs")).first()[0] > 0

    safe = leakage_safe_split(docs, pairs, WEIGHTS, seed=0)
    assert split_leakage(safe, pairs).count() == 0
    # cluster members share one split AND one cluster id (transitively)
    bad = (
        safe.filter(F.col("doc_id") >= 1000)
        .filter(F.col("doc_id") < 5000)
        .withColumn("base", F.floor((F.col("doc_id") - 1000) / 10))
        .groupBy("base")
        .agg(
            F.countDistinct("split").alias("ns"),
            F.countDistinct("cluster").alias("nc"),
        )
        .filter((F.col("ns") > 1) | (F.col("nc") > 1))
        .count()
    )
    assert bad == 0


def test_singletons_keep_marginal_rates(spark):
    docs, pairs = _dup_fixture(spark)
    safe = leakage_safe_split(docs, pairs, WEIGHTS, seed=0)
    singles = safe.filter(F.col("doc_id") >= 5000)
    # a singleton's cluster is itself -> identical to plain hash_split
    plain = hash_split(docs.filter(F.col("doc_id") >= 5000), WEIGHTS, seed=0)
    merged = singles.select("doc_id", "split").join(
        plain.select("doc_id", F.col("split").alias("s2")), "doc_id"
    )
    assert merged.filter("split <> s2").count() == 0


def test_weight_validation():
    with pytest.raises(ValueError):
        split_sql_case("x", (("a", -1.0), ("b", 2.0)))
    with pytest.raises(ValueError):
        split_sql_case("x", (("a", 0.0), ("b", 0.0)))
