"""Training-data export: deterministic global shuffle + balanced shard
writing — the last stage of a curation pipeline, where the corpus
leaves Spark as N reproducible, size-balanced files whose content and
order do NOT depend on how the input happened to be partitioned.

Determinism matters here: a training run must be repeatable from the
manifest alone, so both the shard assignment and the within-shard
order derive from a content key (the portable 60-bit hash also used by
the sampling coin), never from partition ids, task order, or
``monotonically_increasing_id``.

Scale design (100 TB corpus):
- assignment + sort key are map-side column expressions (no shuffle);
- the single shuffle is the repartition to one partition per shard,
  each sorted within the partition — Spark's sort-based shuffle writer
  spills, so shard size is bounded by disk, not executor memory;
- the manifest is a map-side-combinable groupBy(shard) over 8-byte
  hashes — o(n_shards) output rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_rtcef_spark.functions.scalar import portable_hash64
from flink_rtcef_spark.operators.text import whitespace_tokens


def shard_key(key: Column, seed: int = 0) -> Column:
    """Content-derived 60-bit shuffle key (deterministic across runs,
    partitionings, and Spark versions)."""
    return portable_hash64(F.concat(key.cast("string"), F.lit(f"#shard{seed}")))


def assign_shards(
    df: DataFrame, n_shards: int, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Add ``shard`` (0..n_shards-1) and ``sort_key`` columns.  The
    sort key both orders rows within a shard and IS the global-shuffle
    permutation: reading shards 0..N-1 in sort_key order is a uniform
    deterministic shuffle of the corpus."""
    k = shard_key(F.col(id_col), seed)
    return df.withColumn("shard", (k % n_shards).cast("int")).withColumn(
        "sort_key", k
    )


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
    fmt: str = "parquet",
    order_col: str | None = None,
) -> None:
    """Write exactly one file per shard under ``path/shard=K/``, rows
    in sort_key order — byte-reproducible regardless of input
    partitioning.  One shuffle (repartition on shard), sort within.

    ``order_col`` overrides the within-shard order for CURRICULUM
    exports (e.g. ascending difficulty / quality score): shard
    membership stays hash-determined (each shard remains an unbiased
    corpus sample) while each shard's file is read in curriculum
    order.  Ties break on the content key so the write stays
    deterministic."""
    order = (
        ["shard", order_col, "sort_key", id_col]
        if order_col is not None
        else ["shard", "sort_key", id_col]
    )
    out = (
        assign_shards(df, n_shards, id_col, seed)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions(*order)
    )
    out.write.mode("overwrite").partitionBy("shard").format(fmt).save(path)


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    seed: int = 0,
) -> DataFrame:
    """Per-shard manifest: row count, token count, and an
    order-insensitive content checksum (sum of sort keys mod 2^31-1) —
    what a training job checks before consuming the export, and what
    the driver oracle-verifies.  Output: shard, n_docs, n_tokens,
    checksum."""
    assigned = assign_shards(df, n_shards, id_col, seed)
    n_toks = (
        F.size(whitespace_tokens(text_col)) if text_col is not None else F.lit(0)
    )
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_toks).alias("n_tokens"),
            (F.sum(F.col("sort_key") % 2147483647) % 2147483647).alias("checksum"),
        )
        .select("shard", "n_docs", "n_tokens", "checksum")
    )
