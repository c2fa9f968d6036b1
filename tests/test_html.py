"""html_to_text (operators/web.py): extraction semantics + a Python-re
mirror oracle (Java and Python regex agree on this subset; DuckDB's
RE2 lacks the backreference the script/style rule needs, so the oracle
lives here rather than in the driver set)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from flink_rtcef_spark.operators.web import _ENTITIES, html_to_text

CASES = [
    "<html><body><p>Hello <b>world</b>!</p><p>Second para</p></body></html>",
    "<script>var x = '<p>not text</p>';</script><p>kept</p>",
    "<STYLE>body { color: red }</STYLE>after style",
    "a<br>b<br/>c<BR />d",
    "x &amp; y &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;end",
    "<!-- a comment\nspanning lines --><div>real</div>",
    "<ul><li>one</li><li>two</li></ul>",
    "no markup at all",
    "<p>spaced     out\t\ttabs</p>\n\n\n\n<p>far below</p>",
    "<a href='http://x.example/?q=1&amp;r=2'>link text</a> tail",
    # escaped entity reference: visible text is '&lt;' (one decode,
    # never two) — regression for the &amp;-last ordering rule
    "<p>write &amp;lt; for a literal less-than</p>",
]


def _py_html_to_text(s: str) -> str:
    s = re.sub(r"(?is)<(script|style)\b[^>]*>.*?</\1>", " ", s)
    s = re.sub(r"(?s)<!--.*?-->", " ", s)
    s = re.sub(r"(?i)</(p|div|h[1-6]|li|tr|table|blockquote|section|article)>", "\n", s)
    s = re.sub(r"(?i)<br\s*/?>", "\n", s)
    s = re.sub(r"(?s)<[^>]+>", " ", s)
    for ent, rep in _ENTITIES:
        s = s.replace(ent, rep)
    s = re.sub(r"[ \t\r]+", " ", s)
    s = re.sub(r" ?\n ?", "\n", s)
    s = re.sub(r"\n{3,}", "\n\n", s)
    return s.strip()


def test_matches_python_reference(spark):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)], "i long, html string")
    got = {
        r["i"]: r["text"]
        for r in df.select("i", html_to_text("html").alias("text")).collect()
    }
    for i, c in enumerate(CASES):
        assert got[i] == _py_html_to_text(c), (c, got[i])


def test_semantics(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "html string")
    out = [r["t"] for r in df.select(html_to_text("html").alias("t")).collect()]
    assert out[0] == "Hello world !\nSecond para"
    assert "not text" not in out[1] and "kept" in out[1]
    assert out[2] == "after style"
    assert out[3] == "a\nb\nc\nd"
    assert out[4] == 'x & y <tag> "q" \'s\' end'
    assert out[5] == "real"
    assert out[6] == "one\ntwo"
    assert out[7] == "no markup at all"
    assert "  " not in out[8] and "\n\n\n" not in out[8]
    assert out[9] == "link text tail"
    assert out[10] == "write &lt; for a literal less-than"


def test_plan_is_jvm_only(spark, tmp_path):
    spark.createDataFrame([("<p>x</p>",)], "html string").write.parquet(
        str(tmp_path / "h")
    )
    df = spark.read.parquet(str(tmp_path / "h"))
    sel = df.select(html_to_text("html").alias("t"))
    plan = sel._sc._jvm.PythonSQLUtils.explainString(
        sel._jdf.queryExecution(), "formatted"
    )
    assert "Python" not in plan


def test_streaming_safe(spark, tmp_path):
    src = tmp_path / "html_in"
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)], "i long, html string")
    df.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema("i long, html string").parquet(str(src))
    q = (
        stream.select("i", html_to_text("html").alias("t"))
        .writeStream.format("memory").queryName("html_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(600), 'stream did not drain'
    got = {r["i"]: r["t"] for r in spark.sql("SELECT * FROM html_stream").collect()}
    want = {r["i"]: r["t"] for r in df.select("i", html_to_text("html").alias("t")).collect()}
    assert got == want
