"""URL canonicalization for crawl dedup — pure Column expressions.

Web-crawl corpora reach the dedup stage keyed by URL, and the same
resource hides behind scheme/host case, default ports, "www.",
tracking parameters, query-parameter order, fragments, and trailing
slashes. canonicalize_url collapses those equivalences with JVM-side
regex/array expressions only (RFC 3986 §6 normalization subset plus
the standard tracking-param strip) — no UDF, so it rides whole-stage
codegen and predicate pushdown like any built-in.

Scope (documented, deliberate): scheme+host lowercase; "www." strip;
default-port strip (http:80 / https:443); fragment drop; tracking
params dropped (utm_*, gclid, fbclid, ref, mc_eid, case-insensitive);
remaining query params byte-order sorted; empty path -> "/"; trailing
slash stripped off non-root paths. Out of scope: percent-encoding
normalization, userinfo, IDN — each is a documented extension point,
not silent behavior.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# case-insensitive tracking-parameter names dropped during
# canonicalization; RE2-compatible (works verbatim in Spark and DuckDB)
TRACKING_PARAM_RE = r"(?i)^(utm_[a-z0-9_]*|gclid|fbclid|ref|mc_eid)="


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (see module doc).
    Malformed input (no scheme://host) yields NULL rather than a
    half-canonical string."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    authority = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    host_raw = F.lower(F.regexp_extract(authority, r"^([^:]*)", 1))
    host = F.regexp_replace(host_raw, r"^www\.", "")
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    keep_port = F.when(
        (port == "")
        | ((scheme == F.lit("http")) & (port == "80"))
        | ((scheme == F.lit("https")) & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path_raw = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path_raw == "", F.lit("/")).otherwise(
        F.when(
            (F.length(path_raw) > 1) & path_raw.endswith("/"),
            path_raw.substr(F.lit(1), F.length(path_raw) - 1),
        ).otherwise(path_raw)
    )
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    kept = F.array_join(F.array_sort(params), "&")
    return F.when(
        (scheme != "") & (host != ""),
        F.concat(
            scheme,
            F.lit("://"),
            host,
            keep_port,
            path,
            F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
        ),
    )
