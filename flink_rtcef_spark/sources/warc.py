"""WARC (Web ARChive, ISO 28500) source — the ingest format of a
crawled-web corpus (CommonCrawl ships ~100 TB/month of .warc files).

Scan strategy: ``spark.read.text(path, lineSep="WARC/1.0\\r\\n")``
splits the file on record starts, so each row is one WARC record
(headers + blank line + payload).  All field extraction is JVM
``regexp_extract`` / ``substring_index`` column expressions riding in
the same WholeStageCodegen span as the scan — zero Python in the path.

Scale notes (what survives 100 TB):

- UNCOMPRESSED ``.warc`` splits at arbitrary byte offsets: Spark's
  HadoopLineReader seeks to the next delimiter, so a 1 GiB warc file
  fans out across tasks like any text file.  Standard ``.warc.gz``
  (one gzip member per record) is NOT splittable by stock Hadoop
  codecs — each file becomes one task; CommonCrawl's ~1 GiB shard
  size makes that acceptable (1000 executors x 1 file/task), or
  re-chunk once on ingest.
- Delimiter-based framing assumes payload bytes never contain
  ``WARC/1.0\\r\\n`` at a chance offset; real archives satisfy this in
  practice (the sequence requires an embedded archive).  ``strict=True``
  verifies each record's actual payload length against its
  ``Content-Length`` header and drops mismatches — a torn record from
  a delimiter collision (or a truncated file) fails that check, so
  corruption is contained to the colliding record, never propagated.

Reference parity note: the reference engine reads Kafka/CSV maritime
streams only (`sources/io.py` covers those); WARC is part of the
beyond-reference web-curation surface, feeding operators/web.py
(URL canonicalization, domain filters) and the text/dedup stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_DELIM = "WARC/1.0\r\n"

#: WARC named fields pulled into columns (header name -> column name)
_WARC_HEADERS = {
    "WARC-Type": "record_type",
    "WARC-Target-URI": "target_uri",
    "WARC-Date": "warc_date",
    "WARC-Record-ID": "record_id",
    "Content-Length": "content_length",
}


def _header(name: str):
    # headers end at the first blank line; names are case-insensitive
    # per spec but emitted canonically by every mainstream writer
    block = F.substring_index(F.col("value"), "\r\n\r\n", 1)
    return F.regexp_extract(block, rf"(?m)^{name}:\s*([^\r\n]*)", 1)


def read_warc(
    spark: SparkSession,
    path: str,
    strict: bool = False,
    keep_http_headers: bool = False,
) -> DataFrame:
    """Read WARC file(s) into one row per record.

    Columns: ``record_type, target_uri, warc_date, record_id,
    content_length (long), http_status (int, response records),
    http_content_type, body (payload after HTTP headers when present,
    else the raw payload)`` plus ``http_headers`` if requested.

    ``strict=True`` drops records whose measured payload length
    disagrees with the ``Content-Length`` header (torn/truncated
    records) instead of passing them through.
    """
    raw = spark.read.text(path, lineSep=RECORD_DELIM).filter(
        F.length("value") > 0  # the split artifact before the first record
    )
    cols = [_header(h).alias(c) for h, c in _WARC_HEADERS.items()]
    # payload = everything after the first blank line, minus the
    # trailing record separator (two CRLFs)
    payload = F.expr("substring(value, instr(value, '\r\n\r\n') + 4)")
    payload = F.regexp_replace(payload, r"(\r\n){1,2}\z", "")
    df = raw.select(*cols, payload.alias("__payload")).withColumn(
        "content_length", F.col("content_length").try_cast("long")
    )
    if strict:
        df = df.filter(
            F.col("content_length").isNotNull()
            & (F.length("__payload") == F.col("content_length"))
        )
    # HTTP response/request payloads carry their own header block;
    # an HTTP-looking payload WITHOUT a blank line has no header/body
    # split (instr = 0 would silently chop 3 chars via substring(_, 4))
    hdr_end = F.expr("instr(__payload, '\r\n\r\n')")
    is_http = (
        F.col("__payload").startswith("HTTP/")
        | F.col("__payload").rlike(r"^(GET|POST|HEAD|PUT|DELETE|OPTIONS) ")
    ) & (hdr_end > 0)
    http_headers = F.when(
        is_http, F.substring_index(F.col("__payload"), "\r\n\r\n", 1)
    )
    out = df.select(
        *[c for c in _WARC_HEADERS.values()],
        F.regexp_extract(
            F.coalesce(http_headers, F.lit("")), r"^HTTP/\d\.\d\s+(\d{3})", 1
        ).try_cast("int").alias("http_status"),
        F.regexp_extract(
            F.coalesce(http_headers, F.lit("")),
            r"(?mi)^Content-Type:\s*([^\r\n;]*)",
            1,
        ).alias("http_content_type"),
        *([http_headers.alias("http_headers")] if keep_http_headers else []),
        F.when(
            is_http,
            F.expr("substring(__payload, instr(__payload, '\r\n\r\n') + 4)"),
        )
        .otherwise(F.col("__payload"))
        .alias("body"),
    )
    return out


def warc_responses_as_documents(
    spark: SparkSession,
    path: str,
    strict: bool = True,
) -> DataFrame:
    """The ingest head of the curation chain: HTML response records as
    ``(doc_id, url, text, source)`` rows ready for operators/web.py ->
    text/dedup.  ``doc_id`` is a content hash (deterministic under any
    partitioning — the shard-export discipline), ``source`` the host.
    """
    from flink_rtcef_spark.functions.scalar import portable_hash64
    from flink_rtcef_spark.operators.web import url_host

    recs = read_warc(spark, path, strict=strict)
    docs = recs.filter(
        (F.col("record_type") == "response")
        & F.col("http_content_type").startswith("text/")
    )
    return docs.select(
        portable_hash64(F.concat_ws(" ", "target_uri", "body")).alias(
            "doc_id"
        ),
        F.col("target_uri").alias("url"),
        F.col("body").alias("text"),
        url_host(F.col("target_uri")).alias("source"),
    )
