"""URL decomposition + registered-domain derivation — pure Catalyst.

Common-Crawl-style pipelines group/filter by host and registered domain
(per-domain dedup quotas, crawl politeness, quality priors). The grammar
is RFC 3986 Appendix B's regex (public spec), rewritten BACKSLASH-FREE
(`[?]` for `\\?`, `[0-9]` for `\\d`) so the identical pattern string is
valid under Java regex, RE2 (DuckDB oracle) and even inside a Spark SQL
string literal (whose backslash escapes would otherwise corrupt it).

Registered domain uses a small fixed two-level public-suffix set — the
real PSL is a data file, not an algorithm; swap `PUBLIC_SUFFIX_2LD` for
the full list in production. Port/userinfo/fragment handling, '' host
for scheme-relative or relative references, and case folding are pinned
by the q_url_parse gate row against the DuckDB restatement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RFC 3986 App. B, backslash-free: groups 2=scheme 4=authority 5=path
# 6=?query 7=query 9=fragment. Matches every string (all parts optional).
URL_RE = "^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)([?]([^#]*))?(#(.*))?"

# two-level public suffixes recognized by the registered-domain heuristic
PUBLIC_SUFFIX_2LD = ("co.uk", "ac.uk", "gov.uk", "com.au", "co.jp")

_SUF_ALT = "|".join(s.replace(".", "[.]") for s in PUBLIC_SUFFIX_2LD)
REG3_RE = f"([^.]+[.](?:{_SUF_ALT}))$"
REG2_RE = "([^.]+[.][^.]+)$"
USERINFO_RE = "^[^@]*@"
PORT_RE = ":([0-9]+)$"


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add scheme, host, port, reg_domain, path, path_depth, has_query.

    Pure Catalyst regexp_extract/regexp_replace — no UDF, no shuffle; at
    100 TB this composes into the scan stage. path_depth is the '/'
    count of the path ('' and '/' are depth 0); has_query is 1 when a
    '?' part exists (even empty, per RFC: '?' alone is a query).

    STAGED through intermediate columns (round 8, guide §1.2 per-task
    work): building every output as one expression tree inlined the
    hostport/host regex chains into each consumer (the reg_domain CASE
    alone re-ran the 3-regex host chain 5x per row). Multi-referenced
    non-cheap columns block CollapseProject, so each chain now evaluates
    once per row; the emitted values are bit-identical."""
    u = F.col(url_col)
    tmp_hp, tmp_r3, tmp_r2 = "__url_hostport", "__url_rd3", "__url_rd2"
    staged = (
        df.withColumn(
            tmp_hp, F.regexp_replace(F.regexp_extract(u, URL_RE, 4), USERINFO_RE, "")
        )
        .withColumn("host", F.lower(F.regexp_replace(F.col(tmp_hp), PORT_RE, "")))
        .withColumn("path", F.regexp_extract(u, URL_RE, 5))
        .withColumn(tmp_r3, F.regexp_extract(F.col("host"), REG3_RE, 1))
        .withColumn(tmp_r2, F.regexp_extract(F.col("host"), REG2_RE, 1))
    )
    path = F.col("path")
    out = (
        staged.withColumn("scheme", F.lower(F.regexp_extract(u, URL_RE, 2)))
        .withColumn(
            "port", F.nullif(F.regexp_extract(F.col(tmp_hp), PORT_RE, 1), F.lit("")).cast("int")
        )
        .withColumn(
            "reg_domain",
            F.when(F.col(tmp_r3) != "", F.col(tmp_r3))
            .when(F.col(tmp_r2) != "", F.col(tmp_r2))
            .otherwise(F.col("host")),
        )
        .withColumn(
            "path_depth",
            F.when((path == "") | (path == "/"), 0)
            .otherwise(F.length(path) - F.length(F.replace(path, F.lit("/"), F.lit(""))))
            .cast("int"),
        )
        .withColumn(
            "has_query",
            (F.regexp_extract(u, URL_RE, 6) != "").cast("int"),
        )
    )
    return out.drop(tmp_hp, tmp_r3, tmp_r2)


def sql_url_parts(url: str) -> dict[str, str]:
    """The identical derivation as portable SQL snippets (valid in both
    DuckDB and Spark SQL — the oracle restatement)."""
    hostport = f"regexp_replace(regexp_extract({url}, '{URL_RE}', 4), '{USERINFO_RE}', '')"
    host = f"lower(regexp_replace({hostport}, '{PORT_RE}', ''))"
    path = f"regexp_extract({url}, '{URL_RE}', 5)"
    rd3 = f"regexp_extract({host}, '{REG3_RE}', 1)"
    rd2 = f"regexp_extract({host}, '{REG2_RE}', 1)"
    return {
        "scheme": f"lower(regexp_extract({url}, '{URL_RE}', 2))",
        "host": host,
        "port": f"cast(nullif(regexp_extract({hostport}, '{PORT_RE}', 1), '') as int)",
        "reg_domain": (
            f"case when {rd3} <> '' then {rd3} when {rd2} <> '' then {rd2} else {host} end"
        ),
        "path": path,
        "path_depth": (
            f"cast(case when {path} = '' or {path} = '/' then 0 "
            f"else length({path}) - length(replace({path}, '/', '')) end as int)"
        ),
        "has_query": f"cast(regexp_extract({url}, '{URL_RE}', 6) <> '' as int)",
    }


# --- hyperlink extraction + resolution (link-graph primitive) ---------------

# double-quoted href values only (the synthesized corpora and the pin
# tests document the limitation; single-quoted/bare attributes are rare
# in modern markup and would need a second alternation on both engines)
HREF_RE = 'href="([^"]*)"'


def resolve_link(scheme: F.Column, host: F.Column, href: F.Column) -> F.Column:
    """Resolve an href against its page's (scheme, host) with the naive
    public rule set: absolute http(s) passes through; '/path' is
    host-absolute; anything else is appended under '/'; '' href or a
    hostless base resolves to '' (unresolvable). No dot-segment merge
    (RFC 3986 5.2.4) — documented out of scope."""
    absolute = href.startswith("http://") | href.startswith("https://")
    rooted = F.concat(scheme, F.lit("://"), host, href)
    relative = F.concat(scheme, F.lit("://"), host, F.lit("/"), href)
    return (
        F.when(href == "", "")
        .when(absolute, href)
        .when(host == "", "")
        .when(href.startswith("/"), rooted)
        .otherwise(relative)
    )


def extract_links(df: DataFrame, html_col: str = "html", url_col: str = "url") -> DataFrame:
    """One row per double-quoted href in the page markup: (…, link_idx,
    href, resolved, dst_host, dst_reg_domain). Pure Catalyst —
    regexp_extract_all + posexplode + the same parse expressions as
    with_url_parts applied to the resolved target; composes into the
    scan stage at 100 TB, and the (src_domain, dst_domain) rollup
    downstream is one shuffle."""
    u = F.col(url_col)
    # STAGED (round 8, see with_url_parts): the page-level scheme/host
    # compute ONCE per page BEFORE the explode (not once per link), and
    # the dst chain stages through columns so the resolved CASE and the
    # dst host regexes are never inlined into multiple consumers — the
    # pre-r8 expression tree re-ran the whole resolve+parse chain ~10x
    # per link row inside dst_reg_domain alone. Values are bit-identical.
    tmp_s, tmp_h = "__src_scheme", "__src_host"
    tmp_hp, tmp_r3, tmp_r2 = "__dst_hostport", "__dst_rd3", "__dst_rd2"
    base = df.withColumn(
        tmp_s, F.lower(F.regexp_extract(u, URL_RE, 2))
    ).withColumn(
        tmp_h,
        F.lower(
            F.regexp_replace(
                F.regexp_replace(F.regexp_extract(u, URL_RE, 4), USERINFO_RE, ""),
                PORT_RE,
                "",
            )
        ),
    )
    exploded = base.select(
        "*",
        F.posexplode(F.regexp_extract_all(F.col(html_col), F.lit(HREF_RE), F.lit(1))).alias(
            "link_idx", "href"
        ),
    )
    out = (
        exploded.withColumn(
            "resolved", resolve_link(F.col(tmp_s), F.col(tmp_h), F.col("href"))
        )
        .withColumn(
            tmp_hp,
            F.regexp_replace(F.regexp_extract(F.col("resolved"), URL_RE, 4), USERINFO_RE, ""),
        )
        .withColumn("dst_host", F.lower(F.regexp_replace(F.col(tmp_hp), PORT_RE, "")))
        .withColumn(tmp_r3, F.regexp_extract(F.col("dst_host"), REG3_RE, 1))
        .withColumn(tmp_r2, F.regexp_extract(F.col("dst_host"), REG2_RE, 1))
        .withColumn(
            "dst_reg_domain",
            F.when(F.col(tmp_r3) != "", F.col(tmp_r3))
            .when(F.col(tmp_r2) != "", F.col(tmp_r2))
            .otherwise(F.col("dst_host")),
        )
    )
    return out.drop(tmp_s, tmp_h, tmp_hp, tmp_r3, tmp_r2)


def sql_extract_links(pages_cte: str) -> str:
    """DuckDB restatement over a CTE named ``pages(page_id, url, html)``:
    same HREF_RE, same resolution rule, same dst-domain derivation."""
    p = sql_url_parts("url")
    resolved = (
        "case when href = '' then '' "
        "when href like 'http://%' or href like 'https://%' then href "
        f"when {p['host']} = '' then '' "
        f"when href like '/%' then {p['scheme']} || '://' || {p['host']} || href "
        f"else {p['scheme']} || '://' || {p['host']} || '/' || href end"
    )
    d = sql_url_parts("resolved")
    return f"""
x as (
  select page_id, url, cast(i - 1 as int) as link_idx, hs[i] as href
  from (select page_id, url, regexp_extract_all(html, '{HREF_RE}', 1) as hs from {pages_cte}),
       unnest(generate_series(1, len(hs))) as t(i)
),
r as (select page_id, link_idx, href, {resolved} as resolved from x),
f as (select page_id, link_idx, href, resolved,
        {d['host']} as dst_host, {d['reg_domain']} as dst_reg_domain
      from r)
"""


# --- robots.txt politeness decisions (RFC 9309 core) ------------------------


def apply_robots(pages: DataFrame, rules: DataFrame) -> DataFrame:
    """Crawl-politeness verdict per page against per-domain robots rules.

    ``rules``: (reg_domain, rule_type in {'allow','disallow'},
    path_prefix). RFC 9309 longest-match semantics, wildcard-free core
    (no '*'/'$' — documented subset): among rules whose prefix starts
    the page path, the LONGEST wins; at equal length 'allow' wins; no
    matching rule -> allowed. Adds (allowed int, rule_type, rule_len).

    Scale shape: rules are a per-domain dim table (robots files are
    tiny). The per-domain rule sets are pre-grouped into ARRAYS (a tiny
    aggregation on the dim side), broadcast-joined 1:1 onto the page
    table, and the longest-match winner is picked by an array fold in
    the SAME projection — the page table is never row-multiplied and
    never shuffled at all (the pre-r8 shape exploded pages x rules and
    re-collapsed them through a row_number window, one full exchange +
    sort of the multiplied table)."""
    r = rules.select(
        F.col("reg_domain"),
        F.struct(
            F.length("path_prefix").cast("int").alias("rule_len"),
            F.col("rule_type").alias("rule_type"),
            F.col("path_prefix").alias("path_prefix"),
        ).alias("__rule"),
    )
    per_dom = r.groupBy("reg_domain").agg(F.collect_list("__rule").alias("__rules"))
    j = pages.join(F.broadcast(per_dom), "reg_domain", "left")
    matched = F.filter(
        F.col("__rules"), lambda rr: F.col("path").startswith(rr["path_prefix"])
    )

    def better(rr, acc):
        # the window ordering this replaces: rule_len desc, rule_type
        # asc, path_prefix asc — a total order, so the fold's winner is
        # independent of collect_list order
        return (rr["rule_len"] > acc["rule_len"]) | (
            (rr["rule_len"] == acc["rule_len"])
            & (
                (rr["rule_type"] < acc["rule_type"])
                | ((rr["rule_type"] == acc["rule_type"]) & (rr["path_prefix"] < acc["path_prefix"]))
            )
        )

    best = F.aggregate(
        matched,
        F.lit(None).cast("struct<rule_len:int,rule_type:string,path_prefix:string>"),
        lambda acc, rr: F.when(acc.isNull() | better(rr, acc), rr).otherwise(acc),
    )
    # explode(array(best)) is a Generate barrier: projection collapse
    # would otherwise inline the (interpreted, higher-order) fold into
    # EVERY downstream reference — allowed/rule_type/rule_len would each
    # re-run it per row (measured 3x the stage)
    out = j.select("*", F.explode(F.array(best)).alias("__best"))
    return out.select(
        *[c for c in pages.columns],
        F.when(F.col("__best").isNotNull() & (F.col("__best")["rule_type"] == "disallow"), 0)
        .otherwise(1)
        .alias("allowed"),
        F.col("__best")["rule_type"].alias("rule_type"),
        F.col("__best")["rule_len"].cast("int").alias("rule_len"),
    )


def surt_key(host: F.Column, path: F.Column) -> F.Column:
    """Simplified SURT (Sort-friendly URI Reordering Transform — the
    public convention behind the Common-Crawl/Wayback CDX index key):
    host labels reversed and comma-joined, then ')' and the path, e.g.
    www.example.co.uk/p -> 'uk,co,example,www)/p'. Range-partitioning or
    sorting by this key clusters every host of a domain (and every
    domain of a TLD) into contiguous ranges — the locality that makes
    per-domain scans and Iceberg partition pruning work at crawl scale.
    Subset: scheme/port/query normalization omitted (documented)."""
    return F.concat(
        F.array_join(F.reverse(F.split(host, "[.]")), ","), F.lit(")"), path
    )
