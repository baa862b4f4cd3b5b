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


class TestParagraphDedup:
    def test_boilerplate_kept_once_and_doc_reconstruction(self, spark):
        rows = {r["doc_id"]: r for r in Q.q_paragraph_dedup(spark, SF).collect()}
        texts = [r["text_out"] for r in rows.values()]
        boiler = "subscribe to our newsletter for updates"
        assert sum(t.count(boiler) for t in texts) == 1  # global first occurrence only
        # cohort boilerplate: one survivor per doc_id%3 class
        for c in range(3):
            assert sum(t.count(f"cohort boilerplate {c}") for t in texts) == 1
        # reconstruction consistency (a doc CAN lose all paragraphs when
        # even its text slices duplicate earlier docs — happens at
        # sf0.001 where prefixes repeat)
        for r in rows.values():
            assert r["n_in"] == 4 and 0 <= r["n_kept"] <= 4
            assert (r["n_kept"] == 0) == (r["text_out"] == "")
        # the globally-first doc keeps everything
        first = rows[min(rows)]
        assert first["n_kept"] == 4

    def test_no_python_eval(self, spark):
        plan = Q.q_paragraph_dedup(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, plan


class TestNfcNormalize:
    def test_corpus_has_real_decompositions(self):
        """The gate would also pass on an all-composed corpus; pin that
        the fragments genuinely exercise UAX #15: decomposed pairs, the
        Å singleton, mark reordering, Hangul jamo composition."""
        import unicodedata

        frags = Q._NFC_FRAGMENTS
        changed = [s for s in frags if unicodedata.normalize("NFC", s) != s]
        assert len(changed) >= 6
        assert "Å" in frags  # ANGSTROM singleton
        assert any("̣" in s and s.index("̇") < s.index("̣") for s in changed)  # reorder
        assert any("ᄒ" in s for s in changed)  # jamo

    def test_changed_rows_and_arrow_stage(self, spark):
        out = Q.q_nfc_normalize(spark, SF)
        rows = out.collect()
        n_changed = sum(r["changed"] for r in rows)
        assert 0 < n_changed < len(rows)
        assert all(r["n_nfc"] <= r["n_raw"] for r in rows)  # NFC never longer here
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan, plan  # the one vectorized Python stage
        assert "BatchEvalPython" not in plan, plan
