"""XML sitemap parsing (sitemaps.org protocol 0.9) — the crawl
DISCOVERY surface beside robots.txt's admission surface
(operators/robots.py): a crawler learns WHAT a host wants fetched
(and how often, and how important) from <urlset>/<sitemapindex>
documents before it spends a single request budget.

Provenance: N (native operator; the protocol is a public spec and
Common Crawl/most production crawlers consume it). Sitemaps are
machine-generated flat XML, so the parse is pure codegen regexps —
regexp_extract_all for the <url>/<sitemap> blocks, posexplode, per
field extraction — zero Python, zero shuffle: the q_sitemap_parse
plan is scan → project → generate. Spec semantics implemented:

  - kind: 'index' (<sitemapindex>), 'urlset' (<urlset>), else
    'invalid' (quarantine row with entry_idx = -1, never a failure);
  - <loc> is REQUIRED — blockless or loc-less entries are dropped;
  - <priority> defaults to 0.5 when absent/unparseable (the spec
    default), clamped to [0, 1];
  - <lastmod>/<changefreq> surface as-is (NULL when absent);
  - cross_host flags a loc whose host differs from the sitemap's own
    host — the spec forbids cross-host locs (crawlers must ignore
    them), and a crawl pipeline wants them COUNTED, not silently
    trusted."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sitemap_entries(
    df: DataFrame,
    xml_col: str,
    sitemap_url_col: str,
    id_col: str,
) -> DataFrame:
    """One row per sitemap entry: (id, kind, entry_idx, loc, lastmod,
    changefreq, priority, cross_host). Invalid documents yield one
    entry_idx = -1 quarantine row."""
    x = F.col(xml_col)
    kind = (
        F.when(x.rlike("(?is)<sitemapindex"), F.lit("index"))
        .when(x.rlike("(?is)<urlset"), F.lit("urlset"))
        .otherwise(F.lit("invalid"))
    )
    blocks = (
        F.when(
            kind == "index",
            F.regexp_extract_all(x, F.lit(r"(?is)<sitemap>(.*?)</sitemap>"), 1),
        )
        .when(
            kind == "urlset",
            F.regexp_extract_all(x, F.lit(r"(?is)<url>(.*?)</url>"), 1),
        )
        .otherwise(F.array().cast("array<string>"))
    )
    own_host = F.regexp_extract(F.col(sitemap_url_col), r"https?://([^/]+)", 1)
    base = df.select(
        F.col(id_col).alias("id"),
        kind.alias("kind"),
        own_host.alias("__own_host"),
        blocks.alias("__blocks"),
    )
    e = base.select(
        "id",
        "kind",
        "__own_host",
        F.posexplode_outer("__blocks").alias("__k", "__b"),
    )

    def field(tag: str):
        return F.nullif(
            F.regexp_extract(
                F.col("__b"), rf"(?is)<{tag}>\s*(.*?)\s*</{tag}>", 1
            ),
            F.lit(""),
        )

    loc = field("loc")
    loc_host = F.regexp_extract(loc, r"https?://([^/]+)", 1)
    raw_pri = field("priority").try_cast("double")
    priority = F.when(
        F.col("kind") == "urlset",
        F.least(F.greatest(F.coalesce(raw_pri, F.lit(0.5)), F.lit(0.0)), F.lit(1.0)),
    )
    out = e.select(
        "id",
        "kind",
        F.coalesce(F.col("__k"), F.lit(-1)).cast("int").alias("entry_idx"),
        loc.alias("loc"),
        field("lastmod").alias("lastmod"),
        F.when(F.col("kind") == "urlset", field("changefreq")).alias(
            "changefreq"
        ),
        priority.alias("priority"),
        F.when(
            loc.isNotNull(), (loc_host != F.col("__own_host")).cast("int")
        ).alias("cross_host"),
    )
    # loc is required: entries without one drop; quarantine rows
    # (entry_idx = -1, loc NULL) survive
    return out.filter(F.col("loc").isNotNull() | (F.col("entry_idx") == -1))
