"""html->text extraction: engine (Java-regex Catalyst chain) vs the
regex-free scalar character-walk twin (tests/html_reference_impl.py),
edge-semantics pins, and plan hygiene (pure codegen, no Python eval)."""

import random

import pytest
from pyspark.sql import functions as F

from convert_spark.operators import extract

import html_reference_impl as twin


def _engine(spark, strings):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "i int, html string"
    )
    out = (
        df.select(
            "i",
            extract.html_title_col(F.col("html")).alias("title"),
            extract.html_text_col(F.col("html")).alias("text"),
        )
        .orderBy("i")
        .collect()
    )
    return [(r["title"], r["text"]) for r in out]


EDGES = [
    "",
    "plain text, no markup",
    "<p>closed</p>",
    "<P CLASS='x'>upper</P><SCRIPT>drop()</SCRIPT><Style>s{}</Style>ok",
    "<script>var a=1;\nif(a<2){b=3;}</script>tail",
    "<script>unclosed stays, then tag-strip eats only the opener",
    "<style>unclosed too",
    "<!-- unclosed comment <b>x</b>",
    "<!-- closed --><i>y</i>",
    "<scripty>not a script block</scripty>z",  # \b guard
    "<script >spaced attr-less opener</script >q",
    "a</script>stray closer",
    "&amp;nbsp; stays literal; &lt;b&gt; &quot;q&quot; &#39;s&#39;&nbsp;.",
    "<title>t1</title><title>t2</title>",  # first title wins
    "<titlex y>absorbed</title>after",  # no \b after 'title'
    "<title>open only",
    "no title at all",
    " \t\r\n mixed \n\n whitespace \t ",
    "<a\nhref='u'\n>multi\nline tag</a>",
    "<script src='x'>body < 9 </script><p>kept</p>",
    "<!--<script>comment first: this script text is NOT a block--><script>but this is</script>k",
]


class TestHtmlTwinParity:
    def test_edges(self, spark):
        got = _engine(spark, EDGES)
        want = [(twin.html_title(s), twin.html_text(s)) for s in EDGES]
        for s, g, w in zip(EDGES, got, want):
            assert g == w, (s, g, w)

    def test_fuzz_corpus(self, spark):
        """400 seeded random compositions of markup fragments — one Spark
        pass vs the scalar twin (three-engine agreement with the DuckDB
        oracle comes from the q_html_text gate row)."""
        rng = random.Random(0xC0FFEE)
        frags = [
            "<script>", "</script>", "</script \t>", "<style>", "</style>",
            "<!--", "-->", "<p>", "</p>", "<P  a='b'>", "<b", ">", "<",
            "<title>", "</title>", "<titleZ>", "<scriptZ>",
            "&amp;", "&lt;", "&gt;", "&nbsp;", "&#39;", "&quot;", "&amp;nbsp;",
            "word", "x<y", "1 2", " ", "\n", "\t", "\r", "{a=1;}",
        ]
        strings = [
            "".join(rng.choice(frags) for _ in range(rng.randrange(0, 24)))
            for _ in range(400)
        ]
        got = _engine(spark, strings)
        for s, g in zip(strings, got):
            assert g == (twin.html_title(s), twin.html_text(s)), repr(s)

    def test_gate_corpus(self, spark):
        """The q_html_text synthesized pages (sf0.001 orders) through the
        real binary-column operator vs the twin."""
        from convert_spark import queries as Q

        Q._load(spark, "/root/testdata/sf0.001", "orders")
        pages = spark.sql(Q._pages_html_sql("string"))
        rows = pages.orderBy("page_id").collect()
        out = extract.html_to_text(
            pages.select("page_id", F.encode("html", "UTF-8").alias("html"))
        )
        got = {r["page_id"]: (r["title"], r["text"]) for r in out.collect()}
        assert len(got) == len(rows) > 0
        for r in rows:
            assert got[r["page_id"]] == (
                twin.html_title(r["html"]),
                twin.html_text(r["html"]),
            )


class TestHtmlPlan:
    def test_no_python_eval(self, spark):
        from convert_spark import queries as Q

        plan = Q.q_html_text(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan

    def test_html_column_pruned(self, spark, tmp_path):
        """A consumer reading only page_id must not scan the wide html
        column once the derived columns are dropped."""
        from convert_spark import datagen

        p = str(tmp_path / "pages.parquet")
        datagen.webpages(spark, 50).write.parquet(p)
        df = extract.html_to_text(spark.read.parquet(p)).select("page_id")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "html" not in plan.split("ReadSchema")[1].splitlines()[0], plan
