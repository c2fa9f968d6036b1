"""Train/validation/test splitting for training corpora — deterministic
hash splits, and the LEAKAGE-SAFE variant that keeps every near-duplicate
cluster on one side of the boundary.

Why the cluster-aware variant exists: a plain per-document split leaks —
after minhash/embedding dedup there remain near-duplicate *clusters*
(kept intentionally, e.g. keep-best policies, or pairs under the dedup
threshold), and if two ~identical documents land in train and test the
eval set is contaminated (the failure mode exact-substring
decontamination papers measure: eval numbers inflate on memorized
near-copies).  The fix is standard: decide the split per CLUSTER, not
per document — every member inherits the decision of its component
representative.

Scale design (100 TB):
- ``hash_split`` is a pure map-side Column expression over the sampling
  coin (functions/scalar.portable_hash64 — md5-derived, identical in
  DuckDB, so assignments are oracle-checkable and reproducible across
  runs, partitionings, and engines).  No shuffle: the CASE chain rides
  in the scan's Project.
- ``leakage_safe_split`` adds the near-dup component resolution
  (operators/dedup.connected_components — O(log n) large-star rounds
  over o(pairs) 16-byte edges) and ONE hash join of the corpus against
  the o(clustered docs) component table.  Documents in no pair are
  their own singleton cluster and never join-shuffle (left join keeps
  them NULL -> coalesce to own id).
- ``split_leakage`` is the audit: a pairs-vs-assignment join counting
  candidate pairs that straddle splits — 0 by construction for the
  cluster-aware split, and the measured contamination rate for any
  other splitting policy you feed it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_rtcef_spark.operators.sampling import hash_fraction

#: the usual pre-training split: almost everything trains
DEFAULT_WEIGHTS: tuple[tuple[str, float], ...] = (
    ("train", 0.98),
    ("val", 0.01),
    ("test", 0.01),
)


def _normalize_weights(
    weights: dict[str, float] | tuple[tuple[str, float], ...] | None,
) -> list[tuple[str, float]]:
    items = list(
        (weights or DEFAULT_WEIGHTS).items()
        if isinstance(weights, dict)
        else (weights or DEFAULT_WEIGHTS)
    )
    if not items or any(w < 0 for _, w in items):
        raise ValueError(f"weights must be non-empty and non-negative: {items}")
    total = sum(w for _, w in items)
    if total <= 0:
        raise ValueError("weights sum to zero")
    return [(name, w / total) for name, w in items]


def split_column(
    key: Column,
    weights: dict[str, float] | tuple[tuple[str, float], ...] | None = None,
    seed: int = 0,
) -> Column:
    """Split-name Column from a key: the [0,1) sampling coin lands in
    cumulative weight intervals, in the order ``weights`` lists them.
    Deterministic in (key, seed) only — invariant to partitioning, row
    order, cluster size, and engine (DuckDB computes the same coin)."""
    items = _normalize_weights(weights)
    coin = hash_fraction(key, seed)
    # nested first-match WHEN chain over cumulative upper edges:
    # coin < c1 -> name1, elif coin < c1+c2 -> name2, ..., else last
    edges: list[tuple[str, float]] = []
    cum = 0.0
    for name, w in items[:-1]:
        cum += w
        edges.append((name, cum))
    out: Column = F.lit(items[-1][0])
    for name, edge in reversed(edges):
        out = F.when(coin < F.lit(edge), F.lit(name)).otherwise(out)
    return out


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | tuple[tuple[str, float], ...] | None = None,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """``df`` + a ``split`` column assigned per document.  Map-side
    only; weights are normalized to sum to 1."""
    return df.withColumn(
        "split", split_column(F.col(id_col).cast("string"), weights, seed)
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float] | tuple[tuple[str, float], ...] | None = None,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    seed: int = 0,
) -> DataFrame:
    """``df`` + ``cluster`` + ``split`` columns where the split is
    decided by the near-dup CLUSTER representative, so no pair in
    ``pairs`` (nor any transitive chain through them) ever straddles a
    split boundary.

    ``pairs`` is any duplicate-pair frame — LSH candidates
    (``lsh_candidate_pairs``), verified Jaccard pairs, embedding
    near-dup pairs — with columns ``id_a``/``id_b``.  Components are
    resolved transitively (A~B~C all land together even without an
    A~C pair).  Documents in no pair are singleton clusters (their own
    representative), preserving the marginal split rates.
    """
    from flink_rtcef_spark.operators.dedup import connected_components

    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    out = (
        df.join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .withColumn("cluster", F.coalesce("component", F.col(id_col)))
        .drop("component")
    )
    return out.withColumn(
        "split", split_column(F.col("cluster").cast("string"), weights, seed)
    )


def split_leakage(
    assigned: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    split_col: str = "split",
) -> DataFrame:
    """Audit: per (split_a, split_b) count of near-dup pairs straddling
    two splits (off-diagonal rows are contamination; the cluster-aware
    split yields none).  Two broadcast-friendly joins of the o(pairs)
    frame against the (id, split) projection — the corpus itself never
    reshuffles."""
    sides = assigned.select(F.col(id_col), F.col(split_col))
    a = sides.withColumnRenamed(id_col, id_a).withColumnRenamed(split_col, "split_a")
    b = sides.withColumnRenamed(id_col, id_b).withColumnRenamed(split_col, "split_b")
    return (
        pairs.join(a, id_a)
        .join(b, id_b)
        .filter(F.col("split_a") != F.col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_leaked_pairs"))
    )


def split_sql_case(
    key_sql: str,
    weights: dict[str, float] | tuple[tuple[str, float], ...] | None = None,
    seed: int = 0,
) -> str:
    """DuckDB twin of :func:`split_column` (oracle/audit parity): the
    same md5-derived coin and cumulative CASE over ``key_sql`` (a SQL
    expression for the key string)."""
    items = _normalize_weights(weights)
    coin = (
        f"(CAST(('0x' || substr(md5({key_sql} || '#{seed}'), 1, 15)) AS BIGINT)"
        f" / {float(1 << 60)!r})"
    )
    branches = []
    cum = 0.0
    for name, w in items[:-1]:
        cum += w
        # split names become SQL string literals: escape embedded quotes
        branches.append(f"WHEN {coin} < {cum!r} THEN '{_sql_str(name)}'")
    return (
        "CASE " + " ".join(branches) + f" ELSE '{_sql_str(items[-1][0])}' END"
    )


def _sql_str(name: str) -> str:
    """Escape a value for embedding in a single-quoted SQL literal."""
    return str(name).replace("'", "''")
