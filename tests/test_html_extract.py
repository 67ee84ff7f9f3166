"""Unit tests for the HTML extraction front end: the pure-Python
parser core on adversarial markup, the Arrow plumbing, and the
Catalyst gates against their Python replay. The differential fixture
corpus (rendered from documents.text) is covered by the registry
queries html_extract_blocks / html_extract_text /
curation_pipeline_v3.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.html_extract import (
    BLOCKS_SCHEMA,
    block_keep_pred,
    boilerplate_keep_sql,
    extract_blocks_py,
    html_extract_blocks,
    html_extract_text,
    html_parse_blocks,
)


def texts(blocks):
    return [b["text"] for b in blocks]


# ---------------------------------------------------------------------------
# parser core
# ---------------------------------------------------------------------------


def test_script_style_content_skipped_even_with_markup_inside():
    html = (
        "<p>before</p>"
        '<script>var s = "<p>fake</p>"; if (a < b) {}</script>'
        "<style>p { color: red } /* <p>also fake</p> */</style>"
        "<p>after</p>"
    )
    assert texts(extract_blocks_py(html)) == ["before", "after"]


def test_entities_decoded_and_nbsp_is_data():
    blocks = extract_blocks_py(
        "<p>&copy; A &amp; B &#8212; C&nbsp;D &lt;tag&gt;</p>"
    )
    # NBSP survives as data (ASCII-only collapse) — one block, the
    # \xa0 inside is NOT a token/block separator
    assert texts(blocks) == ["© A & B — C\xa0D <tag>"]


def test_comments_and_doctype_ignored():
    html = "<!DOCTYPE html><!-- nav: <a href='/'>x</a> --><p>real</p>"
    assert texts(extract_blocks_py(html)) == ["real"]


def test_uppercase_tags_and_unclosed_blocks():
    # html.parser lowercases tag names; unclosed <p>s flush on the
    # NEXT block start (lenient recovery)
    html = "<P>one<P>two<DIV>three"
    blocks = extract_blocks_py(html)
    assert texts(blocks) == ["one", "two", "three"]
    assert [b["tag"] for b in blocks] == ["p", "p", "div"]


def test_attribute_containing_gt_and_quotes():
    html = '<p title="a > b" data-x=\'<y>\'>ok</p>'
    assert texts(extract_blocks_py(html)) == ["ok"]


def test_br_and_hr_split_blocks():
    html = "<p>line one<br>line two<br/>line three<hr>tail</p>"
    assert texts(extract_blocks_py(html)) == [
        "line one",
        "line two",
        "line three",
        "tail",
    ]


def test_whitespace_collapse_and_empty_blocks_dropped():
    html = "<p>  a\t\tb \n c  </p><div>   \n\t </div><p>d</p>"
    blocks = extract_blocks_py(html)
    assert texts(blocks) == ["a b c", "d"]
    # indices are positions among EMITTED blocks (empty div absent)
    assert [b["block_idx"] for b in blocks] == [0, 1]


def test_inline_tags_do_not_split():
    html = "<p>one <b>two</b> <i>three</i> four</p>"
    assert texts(extract_blocks_py(html)) == ["one two three four"]


def test_link_chars_counted_through_nested_inline():
    blocks = extract_blocks_py(
        '<p>pre <a href="/"><b>Li</b>nk</a> mid <a>Go</a> post</p>'
    )
    (b,) = blocks
    assert b["text"] == "pre Link mid Go post"
    assert b["n_chars"] == len("pre Link mid Go post")
    # "Li"+"nk"+"Go" collapsed-concatenated = 6
    assert b["n_link_chars"] == 6


def test_block_tag_attribution():
    html = "<nav>menu</nav><h2>head</h2><p>body</p>"
    assert [(b["tag"], b["text"]) for b in extract_blocks_py(html)] == [
        ("nav", "menu"),
        ("h2", "head"),
        ("p", "body"),
    ]


def test_trailing_text_outside_blocks_flushes():
    assert texts(extract_blocks_py("<p>a</p>tail text")) == [
        "a",
        "tail text",
    ]


def test_empty_and_none_inputs():
    assert extract_blocks_py("") == []
    assert extract_blocks_py(None) == []
    assert extract_blocks_py("no markup at all") == [
        {
            "block_idx": 0,
            "tag": "",
            "text": "no markup at all",
            "n_chars": 16,
            "n_link_chars": 0,
        }
    ]


def test_lists_and_tables_split_per_item():
    html = "<ul><li>a</li><li>b</li></ul><table><tr><td>c</td><td>d</td></tr></table>"
    assert texts(extract_blocks_py(html)) == ["a", "b", "c", "d"]


# ---------------------------------------------------------------------------
# Spark plumbing + gates
# ---------------------------------------------------------------------------


@pytest.fixture()
def pages(spark):
    rows = [
        (
            1,
            '<body><nav><a href="/">Home</a> <a href="/x">Links</a></nav>'
            "<p>a real paragraph of content here.</p>"
            "<footer>fine print</footer></body>",
        ),
        (2, "<p>tiny</p>"),  # below min_chars → extracted ''
        (3, "<div>another long enough block of text</div>"),
    ]
    return spark.createDataFrame(rows, "doc_id long, html string")


def test_html_parse_blocks_matches_python_core(spark, pages):
    got = {
        r["doc_id"]: [row.asDict() for row in r["blocks"]]
        for r in html_parse_blocks(pages).collect()
    }
    for doc_id, html in [
        (r["doc_id"], r["html"]) for r in pages.collect()
    ]:
        assert got[doc_id] == extract_blocks_py(html), doc_id
    assert "array<struct" in BLOCKS_SCHEMA


def test_html_extract_text_gates(spark, pages):
    out = {
        r["doc_id"]: r.asDict()
        for r in html_extract_text(pages).collect()
    }
    # doc 1: nav dropped (tag + link density), footer dropped (tag),
    # paragraph kept
    assert out[1]["extracted"] == "a real paragraph of content here."
    assert (out[1]["n_blocks_raw"], out[1]["n_blocks_kept"]) == (3, 1)
    # doc 2: only block is 4 chars < 10 → row survives, empty text
    assert out[2]["extracted"] == ""
    assert (out[2]["n_blocks_raw"], out[2]["n_blocks_kept"]) == (1, 0)
    assert out[3]["extracted"] == "another long enough block of text"


def test_gate_pred_matches_sql_replay(spark):
    """The Catalyst predicate and the DuckDB WHERE fragment agree on
    a grid of (tag, n_chars, n_link_chars) blocks — the integer
    cross-multiplication discipline."""
    grid = [
        (i, tag, "x" * n, n, l)
        for i, (tag, n, l) in enumerate(
            (t, n, l)
            for t in ["p", "nav", "footer", "div"]
            for n in [1, 9, 10, 11, 40]
            for l in [0, 5, 20, 40]
            if l <= n
        )
    ]
    df = spark.createDataFrame(
        grid, "i long, tag string, text string, n_chars int, n_link_chars int"
    )
    b = F.struct("tag", "text", "n_chars", "n_link_chars")
    got = sorted(
        r["i"]
        for r in df.where(block_keep_pred(b)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE g(i BIGINT, tag VARCHAR, text VARCHAR, "
        "n_chars INT, n_link_chars INT)"
    )
    con.executemany("INSERT INTO g VALUES (?,?,?,?,?)", grid)
    want = sorted(
        r[0]
        for r in con.execute(
            f"SELECT i FROM g WHERE {boilerplate_keep_sql()}"
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_exploded_blocks_view(spark, pages):
    rows = html_extract_blocks(pages).where(F.col("doc_id") == 1).collect()
    assert [r["tag"] for r in rows] == ["nav", "p", "footer"]
    assert [r["block_idx"] for r in rows] == [0, 1, 2]
    nav = rows[0]
    assert nav["n_link_chars"] == len("Home") + len("Links")


# ---------------------------------------------------------------------------
# streaming curation (r13): stateless admission predicate parity
# ---------------------------------------------------------------------------


def test_quality_keep_col_matches_quality_filter(spark):
    """The one-column streaming admission rule must agree with the
    batch quality_filter on every document (same rounded ratios) —
    including edge shapes the gates actually reject."""
    from churn_model_evaluation_platform_spark.operators.text import (
        quality_filter,
        quality_keep_col,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    edge = spark.createDataFrame(
        [
            (9001, ""),  # empty
            (9002, "one two"),  # too few tokens
            (9003, "the " * 50),  # all stopwords, trailing space
            (9004, "zzzzzzzzzzzzzzzzzz " * 20),  # long tokens, no stop
            (9005, "1234 5678 9012 3456 7890 2345"),  # low alpha
        ],
        "doc_id long, text string",
    )
    df = docs.unionByName(edge)
    batch = {
        r["doc_id"]: r["keep"] for r in quality_filter(df).collect()
    }
    stream_kept = {
        r["doc_id"]
        for r in df.where(quality_keep_col()).select("doc_id").collect()
    }
    assert stream_kept == {k for k, keep in batch.items() if keep}
    # the edge rows are all rejected by both
    assert not stream_kept & {9001, 9002, 9004, 9005}
