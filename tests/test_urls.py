"""URL canonicalization — spec edge cases through BOTH engines (the
Catalyst normalizer and the DuckDB SQL twin must agree case by case,
not just on the corpus)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.urls import (
    normalize_url,
    registered_domain,
    url_norm_sql,
)

CASES = [
    # (raw, expected_norm, expected_domain)
    ("HTTP://WWW.Example.COM/", "http://example.com/", "example.com"),
    ("http://example.com", "http://example.com/", "example.com"),
    ("http://example.com:80/a", "http://example.com/a", "example.com"),
    (
        "https://example.com:443/a",
        "https://example.com/a",
        "example.com",
    ),
    # :80 on https is NOT the default — kept
    (
        "https://example.com:80/a",
        "https://example.com:80/a",
        "example.com",
    ),
    (
        "http://example.com:8080/a",
        "http://example.com:8080/a",
        "example.com",
    ),
    # path case preserved; trailing slashes stripped
    ("http://a.net/Case/X///", "http://a.net/Case/X", "a.net"),
    # fragment dropped
    ("http://a.net/x#frag", "http://a.net/x", "a.net"),
    # tracking params dropped, survivors sorted
    (
        "http://a.net/x?z=1&utm_source=f&id=2",
        "http://a.net/x?id=2&z=1",
        "a.net",
    ),
    (
        "http://a.net/x?fbclid=q&gclid=r&utm_campaign=s",
        "http://a.net/x",
        "a.net",
    ),
    # www stripped once; deeper subdomains kept; last-2-label domain
    (
        "http://www.cdn.sub.Site.org/p",
        "http://cdn.sub.site.org/p",
        "site.org",
    ),
    # single-label host: domain falls back to the host itself
    ("http://localhost:9000/x", "http://localhost:9000/x", "localhost"),
    # empty query string
    ("http://a.net/x?", "http://a.net/x", "a.net"),
]


@pytest.fixture(scope="module")
def norm_pairs(request):
    spark = request.getfixturevalue("spark")
    df = spark.createDataFrame([(r,) for r, _, _ in CASES], "u string")
    rows = df.select(
        "u",
        normalize_url(F.col("u")).alias("n"),
        registered_domain(F.col("u")).alias("d"),
    ).collect()
    return {r["u"]: (r["n"], r["d"]) for r in rows}


@pytest.mark.parametrize("raw,norm,dom", CASES)
def test_normalize_spark(norm_pairs, raw, norm, dom):
    assert norm_pairs[raw] == (norm, dom)


@pytest.mark.parametrize("raw,norm,dom", CASES)
def test_normalize_duckdb_twin(raw, norm, dom):
    p = url_norm_sql("u")
    got = duckdb.sql(
        f"SELECT {p['norm']}, {p['domain']} FROM (SELECT '{raw}' AS u)"
    ).fetchone()
    assert got == (norm, dom), raw


def test_robots_longest_match_and_ties(spark):
    from churn_model_evaluation_platform_spark.operators.urls import (
        robots_decisions,
    )

    pages = spark.createDataFrame(
        [
            (1, "/a/b/c", "d.com"),  # blocked by /a
            (2, "/a/b/pub", "d.com"),  # re-allowed by longer /a/b/pub
            (3, "/other", "d.com"),  # no rule -> allowed
            (4, "/a", "e.com"),  # other domain: no rules at all
            (5, "/t", "d.com"),  # length tie allow vs disallow -> allow
        ],
        "doc_id long, path string, domain string",
    )
    rules = spark.createDataFrame(
        [
            ("d.com", "/a", False),
            ("d.com", "/a/b/pub", True),
            ("d.com", "/t", False),
            ("d.com", "/t", True),
        ],
        "domain string, prefix string, is_allow boolean",
    )
    got = {
        r["doc_id"]: (r["allowed"], r["rule_prefix"])
        for r in robots_decisions(pages, rules).collect()
    }
    assert got == {
        1: (False, "/a"),
        2: (True, "/a/b/pub"),
        3: (True, None),
        4: (True, None),
        5: (True, "/t"),
    }
