"""URL canonicalization + registered-domain crawl hygiene — the first
stage of every web-scale corpus pipeline (crawl frontier dedup, domain
rate accounting, blocklist filtering) run BEFORE any text gate.

Normalization spec (RFC 3986 §6 syntax-based normalization plus the
conventional crawl canonicalizations):

1. scheme and host lowercased; a leading ``www.`` stripped;
2. the scheme's DEFAULT port dropped (``:80`` for http, ``:443`` for
   https) — a non-default port (including ``:80`` on https) is kept;
3. the fragment dropped;
4. tracking parameters removed (``utm_*``, ``fbclid``, ``gclid`` —
   the public tracking-param lists), remaining query params sorted
   byte-lexicographically (query order is almost never semantic);
5. trailing slashes stripped from the path; an empty path becomes
   ``/``. Path CASE is preserved (paths are case-sensitive).

The registered domain is approximated as the last two host labels —
deliberately PSL-free (the Public Suffix List is a versioned artifact;
swapping it in changes one regex), documented as the engine's
``co.uk``-class known limit.

Everything is Catalyst expressions (regexp_extract + array lambdas —
no UDF, whole-stage codegen, map-only: normalization adds NO exchange
to whatever plan it joins). The DuckDB oracle re-implements the same
spec from scratch over DuckDB's own regex/list engine, so the
differential pins the SPEC, not a shared implementation. (Beyond the
reference's own surface — training-data-pipeline mandate.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Query parameters dropped by normalization (prefix match for utm_).
TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def _after_scheme(url: Column) -> Column:
    return F.regexp_replace(url, _SCHEME_RE, "")


def url_host(url: Column) -> Column:
    """Lowercased host with any leading ``www.`` stripped."""
    hostport = F.regexp_extract(_after_scheme(url), r"^([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    return F.regexp_replace(host, r"^www\.", "")


def url_port_norm(url: Column) -> Column:
    """``:port`` suffix surviving normalization ('' if absent or the
    scheme default)."""
    hostport = F.regexp_extract(_after_scheme(url), r"^([^/?#]*)", 1)
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    scheme = url_scheme(url)
    return (
        F.when(port == "", F.lit(""))
        .when((scheme == "http") & (port == "80"), F.lit(""))
        .when((scheme == "https") & (port == "443"), F.lit(""))
        .otherwise(F.concat(F.lit(":"), port))
    )


def url_path_norm(url: Column) -> Column:
    """Path with trailing slashes stripped; '' becomes '/'. Case
    preserved."""
    path = F.regexp_extract(_after_scheme(url), r"^[^/?#]*([^?#]*)", 1)
    stripped = F.regexp_replace(path, r"/+$", "")
    return F.when(stripped == "", F.lit("/")).otherwise(stripped)


def url_query_norm(url: Column) -> Column:
    """Query with tracking params dropped and the rest sorted
    byte-lexicographically; '' when nothing survives."""
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~p.startswith("fbclid=")
        & ~p.startswith("gclid="),
    )
    return F.array_join(F.array_sort(kept), "&")


def normalize_url(url: Column) -> Column:
    """The canonical URL string under the module spec."""
    qn = url_query_norm(url)
    return F.concat(
        url_scheme(url),
        F.lit("://"),
        url_host(url),
        url_port_norm(url),
        url_path_norm(url),
        F.when(qn == "", F.lit("")).otherwise(F.concat(F.lit("?"), qn)),
    )


def registered_domain(url: Column) -> Column:
    """Last two labels of the normalized host (PSL-free approximation
    — see module docstring)."""
    host = url_host(url)
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(two == "", host).otherwise(two)


def url_norm_sql(url_expr: str) -> dict:
    """The DuckDB re-implementation of the same spec (independent
    regex/list engine), as SQL snippets over ``url_expr``. Returns the
    pieces so oracles can select any subset."""
    scheme = (
        f"lower(regexp_extract({url_expr}, "
        f"'^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))"
    )
    after = (
        f"regexp_replace({url_expr}, "
        f"'^[A-Za-z][A-Za-z0-9+.\\-]*://', '')"
    )
    hostport = f"regexp_extract({after}, '^([^/?#]*)', 1)"
    host = (
        f"regexp_replace(lower(regexp_extract({hostport}, "
        f"'^([^:]*)', 1)), '^www\\.', '')"
    )
    port_raw = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    port = (
        f"CASE WHEN {port_raw} = '' THEN ''"
        f" WHEN {scheme} = 'http' AND {port_raw} = '80' THEN ''"
        f" WHEN {scheme} = 'https' AND {port_raw} = '443' THEN ''"
        f" ELSE ':' || {port_raw} END"
    )
    path_raw = (
        f"regexp_replace(regexp_extract({after}, "
        f"'^[^/?#]*([^?#]*)', 1), '/+$', '')"
    )
    path = f"CASE WHEN {path_raw} = '' THEN '/' ELSE {path_raw} END"
    qsplit = (
        f"string_split(regexp_extract({url_expr}, '\\?([^#]*)', 1), "
        f"'&')"
    )
    qkept = (
        f"list_sort(list_filter({qsplit}, p -> p <> '' "
        f"AND NOT starts_with(p, 'utm_') "
        f"AND NOT starts_with(p, 'fbclid=') "
        f"AND NOT starts_with(p, 'gclid=')))"
    )
    # DuckDB's array_to_string returns NULL (not '') for an empty
    # list — Spark's array_join returns ''
    query = f"coalesce(array_to_string({qkept}, '&'), '')"
    norm = (
        f"{scheme} || '://' || {host} || {port} || {path} || "
        f"CASE WHEN {query} = '' THEN '' ELSE '?' || {query} END"
    )
    dom_two = f"regexp_extract({host}, '([^.]+\\.[^.]+)$', 1)"
    domain = f"CASE WHEN {dom_two} = '' THEN {host} ELSE {dom_two} END"
    return {
        "scheme": scheme,
        "host": host,
        "port": port,
        "path": path,
        "query": query,
        "norm": norm,
        "domain": domain,
    }


def robots_decisions(
    pages: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
    path_col: str = "path",
    domain_col: str = "domain",
) -> DataFrame:
    """RFC 9309 (robots.txt) path gating: per page, among the rules of
    its domain whose path-prefix matches, the MOST SPECIFIC (longest
    prefix) wins; on a length tie ``allow`` wins; no matching rule
    means allowed. ``rules`` = (domain, prefix, is_allow) — the parsed
    robots corpus, small enough to broadcast (one site's rule list is
    bytes; a whole crawl's is ~domains-sized).

    Wildcards (``*``/``$``) are out of scope — prefix rules only (the
    original 1994 semantics and the overwhelming majority of real
    rules); a wildcard-bearing robots corpus needs a regex-compile
    pass in front.

    Scale: broadcast join on domain + prefix filter, then the winner
    is a struct-max groupBy (map-side combinable, no window); pages
    with no candidate rule never shuffle at all (left join keeps
    them)."""
    cand = pages.join(F.broadcast(rules), domain_col).where(
        F.col(path_col).startswith(F.col("prefix"))
    )
    best = cand.groupBy(id_col).agg(
        F.max(
            F.struct(
                F.length("prefix").alias("l"),
                F.col("is_allow").alias("a"),
                F.col("prefix").alias("p"),
            )
        ).alias("bst")
    )
    return (
        pages.join(best, id_col, "left")
        .select(
            id_col,
            domain_col,
            path_col,
            F.coalesce(F.col("bst.a"), F.lit(True)).alias("allowed"),
            F.col("bst.p").alias("rule_prefix"),
            F.col("bst.a").alias("rule_is_allow"),
        )
    )
