"""Composed training-data filter: rule precedence, branch coverage and
the one-shuffle plan shape. Cross-engine value equality is the
q_filter_pipeline gate row."""

from pyspark.sql import functions as F

from convert_spark import queries as Q

SF = "/root/testdata/sf0.001"


class TestFilterPipeline:
    def test_all_reasons_fire_and_precedence(self, spark):
        rows = Q.q_filter_pipeline(spark, SF).collect()
        by_reason = {}
        for r in rows:
            by_reason.setdefault(r["reason"], []).append(r)
        assert set(by_reason) == {None, "exact_dup", "too_short", "too_punct", "low_stopwords"}
        # precedence: the 'a bb ccc' constant variants are mutual dups —
        # exactly ONE (the min rid) falls through to too_short, the rest
        # flag exact_dup; same for the stopword-free constant.
        shorts = [r for r in by_reason["too_short"] if r["rid"] % 10 == 2]
        lows = [r for r in by_reason["low_stopwords"] if r["rid"] % 10 == 4]
        assert len(shorts) == 1 and len(lows) <= 1
        dup_rids = {r["rid"] for r in by_reason["exact_dup"]}
        assert any(rid % 10 == 2 for rid in dup_rids)  # non-canonical shorts
        # keep flag is exactly reason-is-null
        assert all((r["keep"] == 1) == (r["reason"] is None) for r in rows)

    def test_single_shuffle(self, spark):
        plan = Q.q_filter_pipeline(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "BatchEvalPython" not in plan, plan
