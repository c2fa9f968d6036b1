"""Collector: bucketed dataset persistence + retention.

The reference's Collector (Collector.java:39-304, A12/G5) writes events
into wall-clock-aligned buckets (bucket_id = floor(ts/bucket_size) *
bucket_size, :121), notifies the factory of new dataset versions, and
deletes buckets below the assembled range once the factory ACKs.

Spark shape: ``df.write.partitionBy("bucket_id")`` parquet — at scale
this is the partitioned event lake that partition-prunes at assembly.
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class DatasetNotification:
    dataset_id: str
    path_prefix: str
    buckets_range: list[int]
    version: int
    bucket_count: int


@dataclass
class BucketCollector:
    base_path: str
    bucket_size: int = 86400
    last_k: int = 7
    version: int = 0
    seen_buckets: set[int] = field(default_factory=set)

    def collect(self, df: DataFrame, ts_col: str = "timestamp") -> DatasetNotification | None:
        """Append a microbatch into bucket partitions; emit a dataset
        notification when a new bucket appears (Collector.java:245-270)."""
        bucket = (F.col(ts_col).cast("long") / self.bucket_size).cast("long") * self.bucket_size
        with_bucket = df.withColumn("bucket_id", bucket)
        with_bucket.write.mode("append").partitionBy("bucket_id").parquet(self.base_path)
        buckets_now = {
            int(r[0])
            for r in with_bucket.select("bucket_id").distinct().collect()
        }
        new_buckets = buckets_now - self.seen_buckets
        self.seen_buckets |= buckets_now
        if not new_buckets:
            return None
        self.version += 1
        covered = sorted(self.seen_buckets)[-self.last_k :]
        return DatasetNotification(
            dataset_id=f"ds-{self.version}",
            path_prefix=self.base_path,
            buckets_range=covered,
            version=self.version,
            bucket_count=len(covered),
        )

    def assemble(self, spark: SparkSession, buckets_range: list[int]) -> DataFrame:
        """Union the requested buckets (ModelFactoryEngine.assembleDataset
        :130-182) — partition pruning keeps this a K-bucket scan."""
        df = spark.read.parquet(self.base_path)
        return df.filter(F.col("bucket_id").isin([int(b) for b in buckets_range]))

    def ack(self, buckets_range: list[int]) -> list[int]:
        """Factory ACK -> retention: delete buckets strictly below the
        assembled range (Collector.java:139-162)."""
        if not buckets_range:
            return []
        threshold = min(buckets_range)
        deleted = []
        for b in sorted(self.seen_buckets):
            if b < threshold:
                part = Path(self.base_path) / f"bucket_id={b}"
                if part.exists():
                    shutil.rmtree(part)
                deleted.append(b)
        self.seen_buckets -= set(deleted)
        return deleted
