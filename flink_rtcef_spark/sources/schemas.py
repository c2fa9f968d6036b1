"""Event schemas for the engine's ingestion surface.

The reference's universal record is GenericEvent
(``Wayeb/cef/src/main/scala/stream/GenericEvent.scala:59-64``):
``(id, eventType, timestamp, extraArgs: Map[String, Any])``.  We map it
to a fixed StructType per domain (declared schema -> Catalyst can prune
and push down), keeping a generic MapType path only for schema-on-read
parity with the reference's dynamic attribute map.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Generic event: the reference's GenericEvent with the open attribute map
# kept as an explicit map column (schema-on-read parity path).
GENERIC_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("timestamp", T.LongType(), True),  # epoch seconds
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# Maritime AIS domain — parsed shape produced by the reference's
# MaritimeParser (java/.../MaritimeParser.java:37-133): field rename
# trh->heading, all numerics force-doubled, 8-bit critical_bitstring
# exploded into 8 double flags, gap_start derived from timestamp==-1.
_BITSTRING_FLAGS = [
    # positions 7..0 of the 8-char bitstring (MaritimeParser.java:111-133)
    "stop_start",
    "stop_end",
    "slow_motion_start",
    "slow_motion_end",
    "gap_end",
    "change_in_heading",
    "change_in_speed_start",
    "change_in_speed_end",
]

MARITIME_RAW_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.LongType(), True),
        T.StructField("mmsi", T.StringType(), True),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("speed", T.DoubleType(), True),
        T.StructField("cog", T.DoubleType(), True),
        T.StructField("trh", T.DoubleType(), True),
        T.StructField("entry_nearcoast", T.DoubleType(), True),
        T.StructField("entry_nearcoast5k", T.DoubleType(), True),
        T.StructField("entry_fishing", T.DoubleType(), True),
        T.StructField("entry_natura", T.DoubleType(), True),
        T.StructField("entry_nearports", T.DoubleType(), True),
        T.StructField("entry_anchorage", T.DoubleType(), True),
        T.StructField("exit_nearcoast", T.DoubleType(), True),
        T.StructField("exit_nearcoast5k", T.DoubleType(), True),
        T.StructField("exit_fishing", T.DoubleType(), True),
        T.StructField("exit_natura", T.DoubleType(), True),
        T.StructField("exit_nearports", T.DoubleType(), True),
        T.StructField("exit_anchorage", T.DoubleType(), True),
        T.StructField("next_timestamp", T.LongType(), True),
        T.StructField("critical_bitstring", T.StringType(), True),
    ]
)

MARITIME_SCHEMA = T.StructType(
    [f for f in MARITIME_RAW_SCHEMA.fields if f.name not in ("trh", "critical_bitstring")]
    + [
        T.StructField("heading", T.DoubleType(), True),
        T.StructField("gap_start", T.DoubleType(), True),
        T.StructField("event_type", T.StringType(), True),
    ]
    + [T.StructField(n, T.DoubleType(), True) for n in _BITSTRING_FLAGS]
)

# Finance / fraud domain (JsonEventParser.java:41-107 with idField=pan).
FINANCE_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.LongType(), True),
        T.StructField("pan", T.StringType(), True),
        T.StructField("amount", T.DoubleType(), True),
        T.StructField("is_fraud", T.DoubleType(), True),
        T.StructField("event_type", T.StringType(), True),
    ]
)

BITSTRING_FLAGS = _BITSTRING_FLAGS
