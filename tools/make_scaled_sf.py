"""Generate a x`copies` scaled copy of a testdata sf directory (default:
sf0.1 x10 ≈ sf1) for bigger-than-driver bench points.

Fact tables replicate with all primary/foreign keys shifted per copy so
referential integrity holds (lineitem->orders->customer chains survive,
events keep their per-user streams, embeddings keep vec_id semantics);
dimension tables (region, nation, supplier, part) stay unscaled, as a
real scale-up would have them.  Text/embedding payloads get a per-copy
perturbation (a copy tag appended / vec_id-keyed noise is NOT applied —
embeddings replicate verbatim so ANN probes stay meaningful, while
document text gets the copy tag so the dedup structure doesn't inflate
quadratically).

Usage: python tools/make_scaled_sf.py [src_dir] [dst_dir] [copies]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from flink_rtcef_spark.session import get_spark

DIMS = ("region", "nation", "supplier", "part")
# table -> columns that must shift together per copy (primary + foreign)
KEY_SHIFTS = {
    "customer": ("c_custkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def scale_table(spark, src: str, dst: str, table: str, copies: int) -> int:
    df = spark.read.parquet(f"{src}/{table}.parquet")
    if table in DIMS or copies == 1:
        df.write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
        return df.count()
    shifts = {c: df.agg(F.max(c)).first()[0] + 1 for c in KEY_SHIFTS[table]}
    out = df.withColumn(
        "__c", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
    )
    for col, base in shifts.items():
        out = out.withColumn(col, F.col(col) + F.col("__c") * F.lit(base))
    if table == "documents":
        # Remap each copy's VOCABULARY (prefix every token with the copy
        # id) so near-dup clusters keep their ORIGINAL size instead of
        # inflating x copies (which would quadratically inflate
        # candidate pairs and measure a different workload).  Weaker
        # perturbations measurably fail: the r3 appended tag (1 token of
        # ~40) left cross-copy shingle Jaccard at ~0.9 — at x100 every
        # doc formed a ~100-copy clique and the dedup chain OOMed on
        # ~25M candidate pairs; even a tag every 5 words leaves Jaccard
        # ~0.33, where minhash BANDS still collide at ~37% per pair
        # (measured: 3729 of 3751 candidates were cross-copy) even
        # though verification rejects them.  A per-copy token prefix
        # makes cross-copy Jaccard exactly 0 — zero spurious candidates
        # — while within-copy similarity structure is preserved exactly
        # (both sides of any original near-dup pair get the identical
        # transformation).
        out = out.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(
                        F.lit("c"), F.col("__c").cast("string"), F.lit("_"), w
                    ),
                ),
                " ",
            ),
        )
    out = out.drop("__c")
    out.write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
    return out.count()


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_scaled"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    # optional 4th arg: comma-separated table subset (e.g. the x100
    # point only needs events+documents — scaling lineitem x100 would
    # burn tens of GB for paths whose x10 factor already pinned linear)
    tables = (
        sys.argv[4].split(",") if len(sys.argv) > 4
        else list(DIMS) + list(KEY_SHIFTS)
    )
    spark = get_spark("make_scaled_sf")
    for t in tables:
        n = scale_table(spark, src, dst, t, copies)
        print(f"  {t:<10} -> {n} rows")
    print(f"# scaled dataset at {dst} (x{copies} of {src})")


if __name__ == "__main__":
    main()
