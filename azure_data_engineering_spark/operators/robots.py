"""robots.txt parsing and URL admission for crawl pipelines.

A crawl corpus is only usable if provenance respected exclusion rules;
re-checking admission is also a standard compliance audit before
training. Semantics follow the public REP spec (RFC 9309): rules are
(allow|disallow, path-prefix); the LONGEST matching prefix wins, and
on a length tie allow beats disallow. No rule matching a URL means
allowed (default-allow). Group selection by user-agent is the caller's
concern — pass the rule group that applies.

Scale shape: the ruleset is robots.txt-sized (broadcast); admission is
one broadcast join with a prefix predicate + one per-URL top-1 window
over matched rules. The URL table is never shuffled beyond the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def robots_rules_from_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Parse robots.txt bodies into (id, line_idx, directive, path)
    rule rows: 'Allow:'/'Disallow:' lines (case-insensitive keys,
    values trimmed, comments after '#' stripped); empty-path Disallow
    (the spec's allow-all idiom) and non-rule lines (User-agent,
    Sitemap, junk) are dropped."""
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_idx", "line"),
    )
    clean = F.trim(F.regexp_replace(F.col("line"), r"#.*$", ""))
    directive = F.lower(F.regexp_extract(clean, r"^(?i)(allow|disallow)\s*:", 1))
    path = F.trim(F.regexp_replace(clean, r"^(?i)(allow|disallow)\s*:", ""))
    return (
        lines.select("id", "line_idx", directive.alias("directive"), path.alias("path"))
        .filter((F.col("directive") != "") & (F.col("path") != ""))
    )


def robots_evaluate(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str = "id",
    url_col: str = "url",
) -> DataFrame:
    """Admit or exclude each URL against a rule group. `rules` has
    (directive in {'allow','disallow'}, path) — prefix rules, longest
    match wins, allow wins length ties, default allow. Returns per
    URL: (id, url, path, matched_directive, matched_path, allowed)
    with matched_* NULL for default-allowed URLs."""
    r = F.broadcast(
        rules.select(
            F.col("directive").alias("r_directive"), F.col("path").alias("r_path")
        )
    )
    path = F.regexp_replace(F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/]*", "")
    base = urls.select(
        F.col(id_col).alias("id"),
        F.col(url_col).alias("url"),
        F.when(path == "", F.lit("/")).otherwise(path).alias("path"),
    )
    joined = base.join(r, F.col("path").startswith(F.col("r_path")), "left")
    w = Window.partitionBy("id").orderBy(
        F.length("r_path").desc(),
        # allow first on equal length: 'allow' < 'disallow' lexically
        F.col("r_directive").asc(),
        # total order: equal-length same-directive rules would otherwise
        # make matched_path nondeterministic across runs (ADVICE r10)
        F.col("r_path").asc(),
    )
    ranked = joined.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    )
    return ranked.select(
        "id",
        "url",
        "path",
        F.col("r_directive").alias("matched_directive"),
        F.col("r_path").alias("matched_path"),
        (
            F.col("r_directive").isNull() | (F.col("r_directive") == "allow")
        ).cast("int").alias("allowed"),
    )


def robots_evaluate_multihost(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str = "id",
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Host-keyed admission — the form a 100 TB crawl actually runs
    (VERDICT r10): `rules` carries (host, directive, path) for ALL
    hosts, so broadcasting it as one group (robots_evaluate's shape)
    stops scaling. Each URL's host is extracted and lower-cased, then
    the rule lookup is a HOST EQUI-JOIN with the prefix predicate as a
    join residual: Spark hash-partitions (or broadcasts) on the host
    key — never a nested-loop over the full rule table — and the
    within-host longest-match/allow-tie/total-order window is
    unchanged from robots_evaluate. URLs whose host has no rule group
    are default-allowed (RFC 9309 no-robots semantics). Returns
    (id, url, host, path, matched_directive, matched_path, allowed).
    Plan shape asserted in tests/test_r10_text.py."""
    r = rules.select(
        F.lower(F.col(host_col)).alias("r_host"),
        F.col("directive").alias("r_directive"),
        F.col("path").alias("r_path"),
    )
    host = F.lower(
        F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/]*)", 1)
    )
    path = F.regexp_replace(F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/]*", "")
    base = urls.select(
        F.col(id_col).alias("id"),
        F.col(url_col).alias("url"),
        host.alias("host"),
        F.when(path == "", F.lit("/")).otherwise(path).alias("path"),
    )
    joined = base.join(
        r,
        (F.col("host") == F.col("r_host"))
        & F.col("path").startswith(F.col("r_path")),
        "left",
    )
    w = Window.partitionBy("id").orderBy(
        F.length("r_path").desc(),
        F.col("r_directive").asc(),
        F.col("r_path").asc(),
    )
    ranked = joined.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    )
    return ranked.select(
        "id",
        "url",
        "host",
        "path",
        F.col("r_directive").alias("matched_directive"),
        F.col("r_path").alias("matched_path"),
        (
            F.col("r_directive").isNull() | (F.col("r_directive") == "allow")
        ).cast("int").alias("allowed"),
    )


def robots_sitemaps(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Extract `Sitemap:` directives from robots.txt bodies — the
    DISCOVERY half of RFC 9309 (§2.3: Sitemap lines live OUTSIDE
    user-agent groups and must carry an absolute URL), feeding
    operators/sitemap.sitemap_entries with what to fetch next. Pure
    codegen (posexplode + regexps, same shape as
    robots_rules_from_text). Returns (id, line_idx, sitemap_url,
    absolute) — relative URLs are spec violations a crawler should
    count, so they surface with absolute = 0 instead of vanishing."""
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_idx", "line"),
    )
    clean = F.trim(F.regexp_replace(F.col("line"), r"#.*$", ""))
    url = F.trim(F.regexp_extract(clean, r"^(?i)sitemap\s*:\s*(.*)$", 1))
    return (
        lines.select(
            "id",
            "line_idx",
            url.alias("sitemap_url"),
            url.rlike("^https?://").cast("int").alias("absolute"),
        )
        .filter(F.col("sitemap_url") != "")
    )
