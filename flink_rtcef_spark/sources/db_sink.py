"""Reference-schema JDBC sinks — the Postgres tables Wayeb writes,
emitted from our DataFrames.

The reference persists matches and forecasts through Slick into two
Postgres tables (Wayeb/cef/src/main/scala/db/DetectionsTable.scala,
ForecastsTable.scala; names/schemas from application.conf:53-64
``wayebdb``): ``detections."ComplexEvents"`` (DET_ID, ts, partitionval,
state, events) and ``forecasts."ForecastIntervals"`` (PRED_ID, ts,
partitionval, state, startRelativeToNow, endRelativeToNow,
startRelativeToCounter, endRelativeToCounter, prob, spread, distance,
isCorrect).  This module produces frames with exactly those columns
and writes them over ``.write.jdbc`` with ``createTableColumnTypes``
pinning the exact column types Slick's PostgresProfile would emit
(Int→INTEGER, Long→BIGINT, String→VARCHAR, Double→DOUBLE PRECISION,
Boolean→BOOLEAN), so a reference deployment's downstream SQL keeps
working unchanged against our tables.

One deliberate divergence, for scale: the reference's DET_ID/PRED_ID
is a global serial counter (DBConnector.scala:22-23, ``DetId += 1`` —
inherently single-writer; the reference's own comment warns the
blocking writes are a severe performance hit).  Default here is
``monotonically_increasing_id()`` — unique and distributed, not dense.
Pass ``sequential=True`` for reference-exact dense ids; that is a
single-partition ``row_number`` and belongs on small/final outputs
only, not on a 100 TB detection stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# application.conf wayebdb defaults
DETECTIONS_SCHEMA = "detections"
DETECTIONS_TABLE = "ComplexEvents"
FORECASTS_SCHEMA = "forecasts"
FORECASTS_TABLE = "ForecastIntervals"

# Slick PostgresProfile column types for DetectionsTable.scala:13-18
DETECTIONS_PG_TYPES = {
    "DET_ID": "INTEGER",
    "ts": "BIGINT",
    "partitionval": "VARCHAR",
    "state": "INTEGER",
    "events": "VARCHAR",
}
# ForecastsTable.scala:27-40
FORECASTS_PG_TYPES = {
    "PRED_ID": "INTEGER",
    "ts": "BIGINT",
    "partitionval": "VARCHAR",
    "state": "INTEGER",
    "startRelativeToNow": "INTEGER",
    "endRelativeToNow": "INTEGER",
    "startRelativeToCounter": "BIGINT",
    "endRelativeToCounter": "BIGINT",
    "prob": "DOUBLE PRECISION",
    "spread": "INTEGER",
    "distance": "DOUBLE PRECISION",
    "isCorrect": "BOOLEAN",
}

# Derby needs bounded VARCHARs and has no unbounded VARCHAR / DOUBLE
# PRECISION spelling quirks — used by the in-sandbox executable test.
_DERBY_OVERRIDES = {"VARCHAR": "VARCHAR(4096)", "DOUBLE PRECISION": "DOUBLE"}


def _column_types(types: dict[str, str], dialect: str) -> str:
    if dialect == "postgres":
        m = types
    elif dialect == "derby":
        m = {c: _DERBY_OVERRIDES.get(t, t) for c, t in types.items()}
    else:
        raise ValueError(f"unknown dialect: {dialect}")
    return ", ".join(f"{c} {t}" for c, t in m.items())


def detections_ddl(dialect: str = "postgres") -> str:
    """CREATE TABLE for the reference's ComplexEvents table."""
    cols = _column_types(DETECTIONS_PG_TYPES, dialect).replace(
        "DET_ID INTEGER", "DET_ID INTEGER PRIMARY KEY"
    )
    return (
        f'CREATE TABLE {DETECTIONS_SCHEMA}."{DETECTIONS_TABLE}" ({cols})'
        if dialect == "postgres"
        else f'CREATE TABLE "{DETECTIONS_TABLE}" ({cols})'
    )


def forecasts_ddl(dialect: str = "postgres") -> str:
    """CREATE TABLE for the reference's ForecastIntervals table."""
    cols = _column_types(FORECASTS_PG_TYPES, dialect).replace(
        "PRED_ID INTEGER", "PRED_ID INTEGER PRIMARY KEY"
    )
    return (
        f'CREATE TABLE {FORECASTS_SCHEMA}."{FORECASTS_TABLE}" ({cols})'
        if dialect == "postgres"
        else f'CREATE TABLE "{FORECASTS_TABLE}" ({cols})'
    )


def _assign_id(df: DataFrame, id_name: str, order_cols: list[str], sequential: bool):
    if sequential:
        w = Window.orderBy(*order_cols)  # single partition — small outputs only
        return df.withColumn(id_name, F.row_number().over(w))
    # distributed ids are 64-bit (partition_id << 33 | offset) — they do
    # not fit the reference's INTEGER; the writer widens the column to
    # BIGINT for this mode (see write_jdbc_reference_table)
    return df.withColumn(id_name, F.monotonically_increasing_id() + 1)


def detections_rows(
    det_df: DataFrame,
    matched_ids_col: str | None = None,
    state_col: str | None = None,
    final_state: int | None = None,
    sequential: bool = False,
) -> DataFrame:
    """Map our detection output (key, detection_event_id, detection_ts,
    counter, min_counter, n_matched [, matched_event_ids]) onto the
    reference row (DET_ID, ts, partitionval, state, events).

    ``events`` mirrors ``rm.matchedEvents.toString()`` — the matched
    event list as text (available from ``RegisterCEP.matches``'s
    ``matched_event_ids``; the deterministic kernel keeps only the
    count, so without it the count is recorded).  ``state`` is the
    detecting (final) state: pass ``state_col`` when the frame has it,
    or ``final_state`` for single-final-state automata
    (``compiled`` SDFAs expose ``finals``); defaults to -1 = unknown.
    """
    events = (
        F.col(matched_ids_col).cast("string")
        if matched_ids_col
        else F.concat(F.lit("n_matched="), F.col("n_matched").cast("string"))
    )
    state = (
        F.col(state_col).cast("int")
        if state_col
        else F.lit(-1 if final_state is None else int(final_state))
    )
    base = det_df.select(
        F.col("detection_ts").cast("long").alias("ts"),
        F.col("key").cast("string").alias("partitionval"),
        state.alias("state"),
        events.alias("events"),
    )
    return _assign_id(base, "DET_ID", ["ts", "partitionval"], sequential).select(
        "DET_ID", "ts", "partitionval", "state", "events"
    )


def forecasts_rows(
    fc_df: DataFrame,
    spread: int,
    distance_col: str | None = None,
    is_correct_col: str | None = None,
    sequential: bool = False,
) -> DataFrame:
    """Map our forecast output (key, ts, event_id, counter, prob,
    start_ctr, end_ctr, ...) onto the reference's ForecastIntervals row.

    Relative-to-now = relative-to-counter − current counter
    (DBConnector.writeNewForecast passes both).  ``distance`` (the
    wt-distribution conditional expectation) and ``isCorrect`` (known
    only after evaluation, evaluate_forecasts/interval_join_eval) come
    from optional columns; NULL when not yet evaluated — the reference
    writes them at emission time because its engine evaluates inline.
    """
    dist = F.col(distance_col) if distance_col else F.lit(None).cast("double")
    corr = F.col(is_correct_col) if is_correct_col else F.lit(None).cast("boolean")
    base = fc_df.filter(~F.col("is_detection")).select(
        F.col("ts").cast("long").alias("ts"),
        F.col("key").cast("string").alias("partitionval"),
        F.lit(-1).alias("state"),
        (F.col("start_ctr") - F.col("counter")).cast("int").alias("startRelativeToNow"),
        (F.col("end_ctr") - F.col("counter")).cast("int").alias("endRelativeToNow"),
        F.col("start_ctr").cast("long").alias("startRelativeToCounter"),
        F.col("end_ctr").cast("long").alias("endRelativeToCounter"),
        F.col("prob").cast("double").alias("prob"),
        F.lit(int(spread)).alias("spread"),
        dist.cast("double").alias("distance"),
        corr.alias("isCorrect"),
    )
    return _assign_id(base, "PRED_ID", ["ts", "partitionval"], sequential).select(
        *FORECASTS_PG_TYPES.keys()
    )


def write_jdbc_reference_table(
    df: DataFrame,
    url: str,
    which: str,
    driver: str | None = None,
    dialect: str = "postgres",
    mode: str = "overwrite",
    dbtable: str | None = None,
) -> None:
    """Write a detections/forecasts frame with the reference's exact
    column types (via ``createTableColumnTypes``)."""
    types = dict(
        {"detections": DETECTIONS_PG_TYPES, "forecasts": FORECASTS_PG_TYPES}[which]
    )
    # distributed (non-sequential) ids are BIGINT; reference-exact
    # INTEGER applies only to the dense sequential mode
    id_name = "DET_ID" if which == "detections" else "PRED_ID"
    if dict(df.dtypes).get(id_name) == "bigint":
        types[id_name] = "BIGINT"
    default_table = (
        f'{DETECTIONS_SCHEMA}."{DETECTIONS_TABLE}"'
        if which == "detections"
        else f'{FORECASTS_SCHEMA}."{FORECASTS_TABLE}"'
    )
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable or default_table)
        .option("createTableColumnTypes", _column_types(types, dialect))
        .mode(mode)
    )
    if driver:
        writer = writer.option("driver", driver)
    writer.save()
