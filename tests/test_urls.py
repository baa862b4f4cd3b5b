"""URL decomposition: hand-pinned RFC 3986 edge semantics + plan hygiene.
Cross-engine equivalence is the q_url_parse / q_domain_rollup gate rows;
here the expected VALUES are pinned so both engines being identically
wrong would still fail."""

from pyspark.sql import functions as F

from convert_spark.functions import urls

CASES = [
    # url, scheme, host, port, reg_domain, path, depth, has_query
    ("https://u:pw@WWW.Site.CO.UK:8080/a/b?q=1#f", "https", "www.site.co.uk", 8080, "site.co.uk", "/a/b", 2, 1),
    ("http://example.com", "http", "example.com", None, "example.com", "", 0, 0),
    ("FTP://example.com/", "ftp", "example.com", None, "example.com", "/", 0, 0),
    ("docs/p1", "", "", None, "", "docs/p1", 1, 0),
    ("//cdn.example.com/x.js", "", "cdn.example.com", None, "example.com", "/x.js", 1, 0),
    ("http://localhost:9?", "http", "localhost", 9, "localhost", "", 0, 1),
    ("http://a.gov.uk/", "http", "a.gov.uk", None, "a.gov.uk", "/", 0, 0),
    ("http://x.y.com.au/p/", "http", "x.y.com.au", None, "y.com.au", "/p/", 2, 0),
    ("", "", "", None, "", "", 0, 0),
    ("http://example.com#f?notquery", "http", "example.com", None, "example.com", "", 0, 0),
    ("http://example.com/a//b", "http", "example.com", None, "example.com", "/a//b", 3, 0),
]


class TestUrlParts:
    def test_pinned_cases(self, spark):
        df = spark.createDataFrame(
            [(i, u) for i, (u, *_) in enumerate(CASES)], "i int, url string"
        )
        rows = urls.with_url_parts(df).orderBy("i").collect()
        for r, (u, sch, host, port, rd, path, depth, hq) in zip(rows, CASES):
            got = (r["scheme"], r["host"], r["port"], r["reg_domain"], r["path"], r["path_depth"], r["has_query"])
            assert got == (sch, host, port, rd, path, depth, hq), (u, got)

    def test_no_python_eval_single_project(self, spark):
        df = spark.createDataFrame([(1, "http://a.com/x")], "i int, url string")
        plan = urls.with_url_parts(df)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "Exchange" not in plan, plan

    def test_quota_window_plan(self, spark):
        """Per-domain quota: no Python eval; the rank filter sits directly
        on the WindowExec (WindowGroupLimit pushes the top-k down)."""
        from convert_spark import queries as Q

        plan = Q.q_domain_quota(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, plan
        assert "WindowGroupLimit" in plan, plan

    def test_link_resolution_pins(self, spark):
        cases = [
            # (url, html, expected [(href, resolved, dst_reg_domain)])
            ("https://a.b.com/p", '<a href="https://x.co.uk/q">1</a>', [("https://x.co.uk/q", "https://x.co.uk/q", "x.co.uk")]),
            ("https://a.b.com/p", '<a href="/root">1</a>', [("/root", "https://a.b.com/root", "b.com")]),
            ("https://a.b.com/p", '<a href="sub/x">1</a>', [("sub/x", "https://a.b.com/sub/x", "b.com")]),
            ("https://a.b.com/p", '<a href="">1</a>', [("", "", "")]),
            ("docs/rel", '<a href="sub/x">1</a>', [("sub/x", "", "")]),  # hostless base
            ("docs/rel", '<a href="http://e.com/x">1</a>', [("http://e.com/x", "http://e.com/x", "e.com")]),
            ("https://a.com/p", "<a href='decoy'>1</a>", []),  # single-quoted: ignored
        ]
        df = spark.createDataFrame(
            [(i, u, h) for i, (u, h, _) in enumerate(cases)], "page_id int, url string, html string"
        )
        out = urls.extract_links(df).orderBy("page_id", "link_idx").collect()
        got = {}
        for r in out:
            got.setdefault(r["page_id"], []).append((r["href"], r["resolved"], r["dst_reg_domain"]))
        for i, (_, _, want) in enumerate(cases):
            assert got.get(i, []) == want, (i, cases[i], got.get(i))

    def test_link_extract_plan(self, spark):
        from convert_spark import queries as Q

        plan = Q.q_link_extract(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, plan
        # extraction composes into the scan stage: no hash shuffle at all;
        # the only allowed Exchange is the round-robin _spread parallelism
        # guard ahead of the synth/regex Project (a no-op at production
        # split counts — see queries._okeys, round 8)
        assert "hashpartitioning" not in plan, plan
        assert plan.count("Exchange") <= 1, plan

    def test_surt_locality(self, spark):
        """SURT pins + the property that justifies it: sorting by SURT
        clusters every host of one registered domain contiguously."""
        from convert_spark import queries as Q

        df = spark.createDataFrame(
            [(0, "www.example.co.uk", "/p"), (1, "a.example.co.uk", "/q"),
             (2, "example.com", ""), (3, "zz.org", "/x"), (4, "", "docs/p")],
            "page_id int, host string, path string",
        )
        got = {r["page_id"]: r["surt"] for r in df.select(
            "page_id", urls.surt_key(F.col("host"), F.col("path")).alias("surt")).collect()}
        assert got[0] == "uk,co,example,www)/p"
        assert got[1] == "uk,co,example,a)/q"
        assert got[2] == "com,example)"
        assert got[4] == ")docs/p"
        # locality on the gate corpus: group ranks by reg_domain are
        # contiguous in SURT order
        rows = Q.q_surt(spark, "/root/testdata/sf0.001").collect()
        parsed = {r["page_id"]: r for r in Q.q_url_parse(spark, "/root/testdata/sf0.001").collect()}
        ordered = sorted((r for r in rows if r["host"]), key=lambda r: r["surt"])
        seen, prev = set(), None
        for r in ordered:
            rd = parsed[r["page_id"]]["reg_domain"]
            if rd != prev:
                assert rd not in seen, f"{rd} not contiguous in SURT order"
                seen.add(rd)
                prev = rd

    def test_robots_semantics_pins(self, spark):
        """RFC 9309 longest-match core: longest prefix wins, allow wins
        exact-length ties, no match -> allowed, hostless -> allowed."""
        pages = spark.createDataFrame(
            [
                (0, "d.com", "/p1/q2"),   # allow /p1/q (len 5) beats disallow /p1
                (1, "d.com", "/p1"),      # only disallow /p1 matches
                (2, "d.com", "/p9"),      # no match
                (3, "d.com", ""),         # empty path: no match
                (4, "e.com", "/p1"),      # exact tie allow vs disallow -> allow
                (5, "f.com", "/x"),       # blanket '/' disallow
                (6, "", "docs/p1"),       # hostless: no rules joined
            ],
            "page_id int, reg_domain string, path string",
        )
        rules = spark.createDataFrame(
            [
                ("d.com", "disallow", "/p1"),
                ("d.com", "allow", "/p1/q"),
                ("e.com", "disallow", "/p1"),
                ("e.com", "allow", "/p1"),
                ("f.com", "disallow", "/"),
            ],
            "reg_domain string, rule_type string, path_prefix string",
        )
        got = {r["page_id"]: (r["allowed"], r["rule_type"], r["rule_len"])
               for r in urls.apply_robots(pages, rules).collect()}
        assert got == {
            0: (1, "allow", 5),
            1: (0, "disallow", 3),
            2: (1, None, None),
            3: (1, None, None),
            4: (1, "allow", 3),
            5: (0, "disallow", 1),
            6: (1, None, None),
        }

    def test_robots_broadcast_plan(self, spark):
        from convert_spark import queries as Q

        plan = Q.q_robots(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan  # rules dim is broadcast

    def test_rollup_single_shuffle(self, spark):
        """The domain rollup must be one shuffle: partial_count(distinct)
        expands to two aggregate passes but only one Exchange on the
        grouping key (plus the orderBy's range exchange)."""
        from convert_spark import queries as Q

        plan = Q.q_domain_rollup(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
        n_ex = plan.count("Exchange hashpartitioning")
        assert n_ex <= 2, plan  # (reg_domain) and (reg_domain, host) for the distinct
        assert "BatchEvalPython" not in plan, plan
