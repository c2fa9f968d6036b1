"""Web-provenance curation: URL canonicalization, domain extraction,
and domain-list filtering — the first gate of a crawled corpus (dedup
by canonical URL, drop blocklisted domains, weight by domain).

Everything here is a Column expression over Spark's built-in
``parse_url`` / regexp machinery — map-only, codegen'd, streaming-safe,
zero Python.  The blocklist/allowlist joins broadcast the list side
(domain lists are thousands of rows against a 100 TB corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query parameters that never change content identity (tracking junk)
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "ref", "mc_cid", "mc_eid",
)


def url_host(url: str | Column = "url") -> Column:
    """Lowercased host, leading ``www.`` stripped."""
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_replace(F.lower(F.parse_url(c, F.lit("HOST"))), r"^www\.", "")


def url_domain(url: str | Column = "url") -> Column:
    """Registrable-ish domain: last two host labels (a pragmatic
    approximation of the public-suffix rule that avoids shipping the
    PSL; three-label ccTLDs like ``co.uk`` need the real list)."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def canonical_url(url: str | Column = "url") -> Column:
    """Canonical form: lowercase scheme+host (www-stripped), path with
    trailing slash trimmed, query with tracking params removed and the
    survivors sorted, no fragment.  Two pages differing only in
    tracking junk and param order canonicalize identically — the URL
    dedup key."""
    c = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1))
    path = F.regexp_replace(
        F.coalesce(F.parse_url(c, F.lit("PATH")), F.lit("")), r"/$", ""
    )
    query = F.coalesce(F.parse_url(c, F.lit("QUERY")), F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda kv: (kv != "")
            & ~F.split(kv, "=")[0].isin(*TRACKING_PARAMS),
        )
    )
    qtail = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(
        F.lit("")
    )
    return F.concat(scheme, F.lit("://"), url_host(c), path, qtail)


def dedup_by_canonical_url(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the min-id row per canonical URL — exact dedup keyed on the
    canonical form (the md5-digest shuffle discipline of exact_dedup)."""
    key = F.md5(canonical_url(url_col))
    canon = df.groupBy(key.alias("__cu")).agg(F.min(id_col).alias(id_col))
    return df.join(canon.select(id_col), id_col, "left_semi")


def filter_domains(
    df: DataFrame,
    domains: DataFrame | list[str],
    mode: str = "block",
    url_col: str = "url",
) -> DataFrame:
    """Drop (``mode='block'``) or keep only (``mode='allow'``) rows
    whose registrable domain is in the list.  List side broadcasts."""
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    spark = df.sparkSession
    if not isinstance(domains, DataFrame):
        domains = spark.createDataFrame(
            [(d.lower(),) for d in domains], "__dom string"
        )
    else:
        domains = domains.toDF("__dom")
    tagged = df.withColumn("__dom", url_domain(url_col))
    how = "left_anti" if mode == "block" else "left_semi"
    return tagged.join(F.broadcast(domains), "__dom", how).drop("__dom")


#: entities worth decoding without a full table — the ones that carry
#: text semantics; anything rarer stays literal (harmless to n-gram /
#: quality stages).  ``&amp;`` MUST decode LAST: decoding it first
#: would turn the escaped reference ``&amp;lt;`` into ``&lt;`` and a
#: later pass would double-decode it to ``<`` (standard decoders share
#: this ordering rule).
_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def html_to_text(html_col: str | Column) -> Column:
    """Visible text from raw HTML — the step between WARC payloads and
    every text operator downstream (quality, langid, dedup).

    Pure Column regexp chain (JVM codegen, streaming-safe, no Python):
    1. drop <script>/<style>/<!-- --> blocks wholesale (their content
       is not text);
    2. turn block-level closers/br into newlines so paragraph structure
       survives for the line-based ops (boilerplate cut, paragraph
       dedup);
    3. strip remaining tags;
    4. decode the common entities;
    5. collapse runs of spaces/tabs and 3+ newlines.

    This is the classic 95% extractor (trafilatura-grade main-content
    scoring is out of scope and belongs behind the multimodal decode
    seam); `warc_records.payload` → `html_to_text` → `documents` schema
    is the intended chain, driven in the curation example.
    """
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    # (?is): case-insensitive + dotall so blocks span lines
    c = F.regexp_replace(c, r"(?is)<(script|style)\b[^>]*>.*?</\1>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(
        c, r"(?i)</(p|div|h[1-6]|li|tr|table|blockquote|section|article)>", "\n"
    )
    c = F.regexp_replace(c, r"(?i)<br\s*/?>", "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]+>", " ")
    for ent, rep in _ENTITIES:
        c = F.regexp_replace(c, ent, rep)
    c = F.regexp_replace(c, r"[ \t\r]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    # SQL trim() strips only spaces; newlines need the regex form
    return F.regexp_replace(c, r"^\s+|\s+$", "")
