from flink_rtcef_spark.sources.io import load_table, load_tables, read_events_jsonl
from flink_rtcef_spark.sources.schemas import (
    GENERIC_EVENT_SCHEMA,
    MARITIME_SCHEMA,
    FINANCE_SCHEMA,
)

__all__ = [
    "load_table",
    "load_tables",
    "read_events_jsonl",
    "GENERIC_EVENT_SCHEMA",
    "MARITIME_SCHEMA",
    "FINANCE_SCHEMA",
]
