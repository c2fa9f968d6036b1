"""Multi-dimensional file clustering (Z-order / Morton curves).

Companion to ``bucketing.py``: bucketing co-locates JOIN keys;
Z-ordering co-locates RANGE predicates over several columns at once so
parquet min/max statistics actually skip files.

Why this matters at 100 TB: a table range-sorted on one column prunes
scans filtered on that column only.  A query box over two or more
columns (user AND time window, lon AND lat, source AND length band)
degenerates to a full scan — every file's min/max straddles the second
dimension.  Interleaving the bits of the clustering columns into one
Morton code and range-partitioning + sorting on it keeps every file's
footprint a small hyper-rectangle in ALL clustered dimensions, so a
k-dimensional box query touches O(files-in-box) files instead of all
of them.

Everything here is plain DataFrame/Column work: the Morton code is a
JVM bit-twiddling expression (whole-stage codegen), the layout is one
``repartitionByRange`` + ``sortWithinPartitions``, and the pruning
benefit is measurable from per-file column min/max — which is how the
tests certify it (``file_stats`` + ``box_query_file_selectivity``),
rather than trusting that "Z-order is good".

The dimension-value → rank normalization uses an equi-width quantize
over an observed (or supplied) min/max range — cheap and
deterministic.  Skewed dimensions can be pre-ranked through
``F.percent_rank`` if needed; the code interleaves whatever ints it is
given.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16 bits per dimension: 2 dims -> 32-bit code, 4 dims -> 64-bit.
DEFAULT_BITS = 16


def quantize(col: Column, lo: float, hi: float, bits: int = DEFAULT_BITS) -> Column:
    """Map a numeric column into [0, 2^bits) by equi-width binning over
    [lo, hi] (values outside clamp to the edge bins)."""
    n_bins = 1 << bits
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(max(hi - lo, 1e-300))
    binned = F.floor(scaled * n_bins).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), binned))


def interleave_bits(cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton code: bit j of dimension i lands at position
    ``j * n_dims + i``.  Pure Column arithmetic — shifts and masks —
    so the whole code stays inside codegen; no UDF."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} dims x {bits} bits exceeds a signed 64-bit code")
    code: Column = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftrightunsigned(c.cast("long"), j).bitwiseAND(F.lit(1))
            code = code.bitwiseOR(
                F.shiftleft(bit, j * n + i)
            )
    return code


def zorder_code(
    df: DataFrame,
    dims: list[str],
    bits: int = DEFAULT_BITS,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> Column:
    """Morton code Column for ``dims`` of ``df``.

    ``ranges`` maps dim -> (lo, hi); missing dims are measured with one
    bounded min/max aggregate (a control-plane scan of 2 values per
    dim — at scale, pass catalog-known ranges instead)."""
    ranges = dict(ranges or {})
    missing = [d for d in dims if d not in ranges]
    if missing:
        row = df.agg(
            *[F.min(d).alias(f"lo_{d}") for d in missing],
            *[F.max(d).alias(f"hi_{d}") for d in missing],
        ).collect()[0]
        for d in missing:
            lo, hi = row[f"lo_{d}"], row[f"hi_{d}"]
            ranges[d] = (float(lo), float(hi)) if lo is not None else (0.0, 1.0)
    quantized = [quantize(F.col(d), *ranges[d], bits=bits) for d in dims]
    return interleave_bits(quantized, bits=bits)


def write_zordered(
    df: DataFrame,
    path: str,
    dims: list[str],
    n_files: int = 200,
    bits: int = DEFAULT_BITS,
    ranges: dict[str, tuple[float, float]] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered on the Morton code of ``dims``:
    range-partition into ``n_files`` splits by code, sort within each,
    drop the helper column.  One shuffle, paid once at write time; every
    later multi-dimensional range query prunes files by parquet
    min/max.  Size ``n_files`` for ~128-512 MB per output file."""
    code = zorder_code(df, dims, bits=bits, ranges=ranges)
    (
        df.withColumn("__zcode", code)
        .repartitionByRange(n_files, F.col("__zcode"))
        .sortWithinPartitions("__zcode")
        .drop("__zcode")
        .write.mode(mode)
        .parquet(path)
    )


def file_stats(spark, path: str, dims: list[str]) -> list[dict]:
    """Per-file min/max of ``dims`` — the same statistics a parquet
    reader prunes with, materialized for certification/tests.  One
    aggregate grouped by input file name."""
    df = spark.read.parquet(path)
    aggs = []
    for d in dims:
        aggs += [F.min(d).alias(f"min_{d}"), F.max(d).alias(f"max_{d}")]
    return [
        r.asDict()
        for r in df.groupBy(F.input_file_name().alias("file")).agg(*aggs).collect()
    ]


def box_query_file_selectivity(
    stats: list[dict], box: dict[str, tuple[float, float]]
) -> float:
    """Fraction of files whose min/max footprint intersects the query
    box — an upper bound on the fraction of the table a pruned scan
    reads.  Lower is better; 1.0 means the layout cannot skip
    anything for this box."""
    if not stats:
        return 1.0
    hit = 0
    for s in stats:
        if all(s[f"min_{d}"] <= hi and s[f"max_{d}"] >= lo for d, (lo, hi) in box.items()):
            hit += 1
    return hit / len(stats)
