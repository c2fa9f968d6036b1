"""URL canonicalization / domain filtering / unicode normalization —
the crawl-provenance gate.  All map-only; streaming-safe by the same
argument as test_streaming_curation (single projection/filter)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

URLS = [
    (1, "https://www.Example.com/a/b/?utm_source=x&q=1&fbclid=zzz"),
    (2, "https://example.com/a/b?q=1"),                  # same canonical as 1
    (3, "http://news.site.org/story/"),
    (4, "https://spam.click/win?ref=mail"),
    (5, "https://sub.deep.example.com/a"),
]


def _df(spark):
    return spark.createDataFrame(URLS, "doc_id long, url string")


def test_canonical_url_strips_tracking_and_sorts(spark):
    from flink_rtcef_spark.operators.web import canonical_url

    got = {
        r["doc_id"]: r["cu"]
        for r in _df(spark).select("doc_id", canonical_url().alias("cu")).collect()
    }
    assert got[1] == "https://example.com/a/b?q=1"
    assert got[1] == got[2]
    assert got[3] == "http://news.site.org/story"
    assert got[4] == "https://spam.click/win"  # ref is tracking junk


def test_url_domain_registrable(spark):
    from flink_rtcef_spark.operators.web import url_domain

    got = {
        r["doc_id"]: r["d"]
        for r in _df(spark).select("doc_id", url_domain().alias("d")).collect()
    }
    assert got[1] == "example.com"
    assert got[5] == "example.com"  # deep subdomain folds to registrable
    assert got[4] == "spam.click"


def test_dedup_by_canonical_url_keeps_min_id(spark):
    from flink_rtcef_spark.operators.web import dedup_by_canonical_url

    kept = sorted(r["doc_id"] for r in dedup_by_canonical_url(_df(spark)).collect())
    assert kept == [1, 3, 4, 5]  # doc 2 canonicalizes onto doc 1


def test_filter_domains_block_and_allow(spark):
    from flink_rtcef_spark.operators.web import filter_domains

    df = _df(spark)
    blocked = sorted(r["doc_id"] for r in filter_domains(df, ["spam.click"]).collect())
    assert blocked == [1, 2, 3, 5]
    allowed = sorted(
        r["doc_id"] for r in filter_domains(df, ["example.com"], mode="allow").collect()
    )
    assert allowed == [1, 2, 5]


def test_domain_filter_plan_is_broadcast_and_map_only(spark):
    from flink_rtcef_spark.operators.web import filter_domains

    df = filter_domains(_df(spark), ["spam.click"])
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert not re.findall(r"\(\d+\) Exchange(?!.*Broadcast)", plan.split("==")[0])


def test_normalized_text_folds_compatibility_forms(spark):
    from flink_rtcef_spark.operators.text import normalized_text

    df = spark.createDataFrame(
        [(1, "ﬁａｂ ²"), (2, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["t"] for r in df.select("doc_id", normalized_text().alias("t")).collect()}
    assert got[1] == "fiab 2"  # ligature fi, fullwidth ab, superscript 2
    assert got[2] is None
