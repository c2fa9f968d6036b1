"""Deterministic sampling operators for training-data pipelines.

Large-scale dataset curation needs *reproducible* sampling — the same
(row, seed) must land on the same side on every run, cluster size, and
partitioning, so pipelines can be re-run, audited, and incrementally
extended.  Spark's ``df.sample`` is partition-order-dependent; these
operators key the decision on a portable content hash instead
(functions/scalar.portable_hash64, md5-derived — identical in DuckDB,
so every sampler is oracle-checkable).

All three are embarrassingly parallel: the bernoulli/stratified
samplers are pure map-side filters (no shuffle at all — the predicate
pushes into the scan's Project); per-group top-k shuffles once on the
group key, the same exchange any per-group operator pays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from flink_rtcef_spark.functions.scalar import portable_hash64

_HASH_SPACE = float(1 << 60)  # portable_hash64 is uniform on [0, 2^60)


def hash_fraction(key: Column, seed: int = 0) -> Column:
    """Uniform [0,1) fraction from a key column + seed — the sampling
    coin.  Deterministic across runs/partitionings."""
    return portable_hash64(F.concat(key.cast("string"), F.lit(f"#{seed}"))) / F.lit(
        _HASH_SPACE
    )


def bernoulli_sample(
    df: DataFrame, rate: float, key_col: str, seed: int = 0
) -> DataFrame:
    """Keep each row iff hash(key, seed) < rate.  Map-side only."""
    return df.filter(hash_fraction(F.col(key_col), seed) < F.lit(float(rate)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum bernoulli rates (data mixing / rebalancing: e.g.
    downsample web crawl, keep all books).  The rate table is a literal
    CASE chain — no join, still map-side only."""
    rate_col: Column = F.lit(float(default_rate))
    for value, rate in rates.items():
        rate_col = F.when(
            F.col(strata_col) == str(value), F.lit(float(rate))
        ).otherwise(rate_col)
    return df.filter(hash_fraction(F.col(key_col), seed) < rate_col)


def top_k_per_group(
    df: DataFrame, group_col: str, k: int, key_col: str, seed: int = 0
) -> DataFrame:
    """Deterministic k-per-group subsample ("reservoir" with a hash
    order): rank rows within each group by their sampling coin and keep
    the k smallest.  One shuffle on the group key; ties broken by the
    key column so the result is total-order stable."""
    coin = hash_fraction(F.col(key_col), seed).alias("__coin")
    w = W.partitionBy(group_col).orderBy(F.col("__coin"), F.col(key_col))
    return (
        df.withColumn("__coin", coin)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__coin", "__rn")
    )


def token_budget_sample(
    df: DataFrame,
    source_col: str,
    budgets: dict[str, int],
    tokens_col: str,
    key_col: str,
    seed: int = 0,
) -> DataFrame:
    """Domain mixing under token budgets ("N tokens of web, M of
    code"): within each source, take documents in hash-coin order until
    the running token total fills that source's budget.  A document
    that would cross the boundary is dropped (strict cap).

    Deterministic and partitioning-invariant like the other samplers;
    one shuffle on the source column for the running-sum window.
    Sources absent from ``budgets`` are dropped."""
    coin = hash_fraction(F.col(key_col), seed)
    w = (
        W.partitionBy(source_col)
        .orderBy(coin, F.col(key_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    budget_col: Column = F.lit(0)
    for value, budget in budgets.items():
        budget_col = F.when(
            F.col(source_col) == str(value), F.lit(int(budget))
        ).otherwise(budget_col)
    return (
        df.withColumn("__cum", F.sum(F.col(tokens_col)).over(w))
        .filter(F.col("__cum") <= budget_col)
        .drop("__cum")
    )


def temperature_rates(
    counts: dict[str, int], alpha: float, target_total: int | None = None
) -> dict[str, float]:
    """Per-source keep rates for temperature-weighted mixing: sampled
    mass ∝ count^alpha (alpha=1 natural, alpha→0 uniform — the standard
    multi-source LM recipe).  Rates are scaled so the largest is 1.0
    unless ``target_total`` caps the expected sampled size.  Pure
    arithmetic on per-source totals — no data touched."""
    if not counts or alpha < 0:
        raise ValueError("need non-empty counts and alpha >= 0")
    weights = {s: float(c) ** alpha for s, c in counts.items() if c > 0}
    z = sum(weights.values())
    # expected rows from source s at scale t: t * w_s / z; rate = that / c_s
    scales = {s: (weights[s] / z) / counts[s] for s in weights}
    t_max = min(1.0 / sc for sc in scales.values())  # max t with all rates <= 1
    t = min(t_max, float(target_total)) if target_total else t_max
    return {s: sc * t for s, sc in scales.items()}


def temperature_sample(
    df: DataFrame,
    source_col: str,
    key_col: str,
    alpha: float,
    target_total: int | None = None,
    seed: int = 0,
) -> DataFrame:
    """Temperature mixing over an actual frame: one count aggregate
    (driver-side result bounded by the number of sources — control
    plane), rates from :func:`temperature_rates`, then the map-side
    deterministic stratified filter."""
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if not counts:  # empty upstream stage: pass the emptiness through
        return df
    rates = temperature_rates(counts, alpha, target_total)
    return stratified_sample(df, source_col, rates, key_col, seed=seed)


def epoch_upsample(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str,
    id_col: str,
    seed: int = 0,
    default_weight: float = 1.0,
) -> DataFrame:
    """Repetition-budget UPsampling for pretraining mixes: each row of
    group g appears ``floor(w_g)`` times plus one more with probability
    ``frac(w_g)`` — so the expected copy count is exactly ``w_g`` and
    any integer weight is exact (weight 2.0 = every doc twice).  The
    mix recipes behind DoReMi / Pile-style training repeat high-value
    sources ~2-5 epochs while truncating low-value ones; the
    downsampling half (w < 1) degenerates to :func:`bernoulli_sample`.

    Output adds an ``epoch`` column (0-based copy index) so downstream
    shard writers can interleave epochs rather than emit them
    back-to-back.

    Scale design: one map-side ``explode(sequence(0, floor))`` plus the
    fractional hash-coin filter — no shuffle, no state; the blow-up is
    the OUTPUT size (sum of weights), which is the point.  The
    fractional coin keys on (id, seed) — independent of the coin any
    earlier bernoulli/stratified stage used ONLY if seeds differ, so
    pass a pipeline-unique seed.  Deterministic in (id, seed):
    re-runs, repartitions, and the DuckDB oracle agree row-for-row.
    """
    if any(w < 0 for w in weights.values()) or default_weight < 0:
        raise ValueError(f"weights must be non-negative: {weights}")
    w = F.lit(float(default_weight))
    for g, wg in sorted(weights.items()):
        w = F.when(F.col(group_col) == g, F.lit(float(wg))).otherwise(w)
    full = F.floor(w).cast("int")
    frac = w - F.floor(w)
    # NULL ids must not vanish: a NULL-keyed coin is NULL, which would
    # NULL __n and silently drop the row even at weight >= 1.  Coalesce
    # to a fixed sentinel so NULL-id rows share one (deterministic)
    # fractional coin; their floor(w) copies are unaffected.
    coin = hash_fraction(
        F.coalesce(F.col(id_col).cast("string"), F.lit("\x01null")), seed
    )
    n_copies = (full + (coin < frac).cast("int")).alias("__n")
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn(
            "epoch",
            F.explode(
                F.sequence(F.lit(0).cast("long"), (F.col("__n") - 1).cast("long"))
            ),
        )
        .drop("__n")
    )


def epoch_upsample_sql(
    source_sql: str,
    weights: dict[str, float],
    group_col: str,
    id_col: str,
    seed: int = 0,
    default_weight: float = 1.0,
) -> str:
    """DuckDB twin of :func:`epoch_upsample` (same md5 coin, same
    floor/frac split) for oracle checks.  The epoch fan-out joins a
    bounded range table sized to the max weight."""
    w = repr(float(default_weight))
    for g, wg in sorted(weights.items()):
        # group names become SQL string literals: escape embedded quotes
        g_lit = str(g).replace("'", "''")
        w = f"CASE WHEN s.{group_col} = '{g_lit}' THEN {float(wg)!r} ELSE {w} END"
    coin = (
        f"(CAST(('0x' || substr(md5(COALESCE(CAST(s.{id_col} AS VARCHAR), "
        f"chr(1) || 'null') || '#{seed}'), 1, 15)) "
        f"AS BIGINT) / {float(1 << 60)!r})"
    )
    n = (
        f"(CAST(FLOOR({w}) AS INT) + "
        f"(CASE WHEN {coin} < ({w}) - FLOOR({w}) THEN 1 ELSE 0 END))"
    )
    max_epochs = int(max([*weights.values(), default_weight])) + 1
    return f"""
    SELECT s.*, CAST(r.epoch AS BIGINT) AS epoch
    FROM ({source_sql}) s
    JOIN (SELECT UNNEST(range(0, {max_epochs})) AS epoch) r
      ON r.epoch < {n}
    """
