"""HTML → text extraction + line-level boilerplate removal — the
FRONT END of a web-scale curation pipeline (CCNet, RefinedWeb, Gopher
all run extraction before the quality gates this repo already has;
jusText/trafilatura are the classic block-level recipes).

Reference parity note: the reference pipeline (churn-model-evaluation-
platform) starts from clean tabular text and has no extraction analog;
this module completes the north-star "text analysis" family that
produces the clean ``text`` column everything downstream consumes.

Design — Spark-first, shuffle-free:

* The ONLY Python is the per-document parse (stdlib
  ``html.parser.HTMLParser`` — lenient, handles malformed markup,
  CDATA script/style content, entity refs), Arrow-batched through
  ``mapInArrow`` exactly like the BPE encoder (``bpe.py:266`` shape).
  Map-only: at 100 TB this is embarrassingly parallel, no shuffle.
* The parser emits each doc's blocks as ONE nested
  ``array<struct<block_idx,tag,text,n_chars,n_link_chars>>`` column,
  NOT an exploded frame — so the boilerplate gates and the final
  text reassembly are Catalyst array lambdas (``filter`` /
  ``transform`` / ``array_join``) with ZERO shuffle end-to-end.
  An exploded per-block view is a narrow ``explode`` away when wanted.
* Boilerplate gates are pure-Catalyst predicates over exact integer
  counts (jusText/Gopher reduced to the deterministic subset):
  structural-role tags (nav/footer/aside/header), minimum block
  length, and link density as an INTEGER cross-multiplication
  (``n_link_chars * den <= n_chars * num``) — no float division, so
  the DuckDB replay is bit-exact.

Cross-engine text discipline (the ADVICE-r12 lesson): whitespace is
collapsed with the ASCII class ``[ \\t\\n\\r\\f\\v]+`` and stripped of
ASCII spaces only, matching Java/RE2 ``\\s`` semantics — a decoded
``&nbsp;`` (U+00A0) is DATA on both engines, never a separator.

The differential oracle uses the ``detokenize_real`` trick: the test
corpus is RENDERED from ``documents.text`` through a deterministic
template (``render_demo_html``), so DuckDB can predict every block —
tag, text, char and link-char counts — arithmetically
(``demo_blocks_sql``) and then replay the gates; the Python parser's
output must land on the prediction exactly.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

#: Tags that terminate the current text block (HTML5 block-level set
#: plus structural/table/list tags, <title>, and the void separators
#: <br>/<hr>).
BLOCK_TAGS = frozenset(
    (
        "address article aside blockquote body br dd details dialog div dl "
        "dt fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 head "
        "header hgroup hr html li main nav ol p pre section summary table "
        "tbody td tfoot th thead title tr ul"
    ).split()
)

#: Content inside these tags is never text (CSS/JS/alt-templates).
SKIP_TAGS = frozenset(["script", "style", "noscript", "template"])

#: Structural roles whose blocks are boilerplate by construction
#: (trafilatura's discard list, deterministic subset).
DROP_TAGS = ("nav", "footer", "aside", "header")

_WS_RE = re.compile(r"[ \t\n\r\f\v]+")  # ASCII \s — Java/RE2 parity


def _collapse(s: str) -> str:
    """Collapse ASCII whitespace runs to one space, strip ASCII-space
    edges (Spark ``trim`` strips spaces only — U+00A0 etc. survive)."""
    return _WS_RE.sub(" ", s).strip(" ")


class _BlockParser(HTMLParser):
    """Streaming block extractor: text nodes accumulate into the
    current block; any BLOCK_TAGS start/end flushes it. Link chars are
    the collapsed length of text seen while inside <a> — the jusText
    link-density numerator. Lenient by inheritance: unclosed tags,
    uppercase names, attributes containing '>', and bare '&' all take
    the stdlib parser's recovery path."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._parts: list[str] = []
        self._link_parts: list[str] = []
        self._tag = ""
        self._skip = 0
        self._link = 0

    def _flush(self) -> None:
        text = _collapse("".join(self._parts))
        if text:
            link_text = _collapse("".join(self._link_parts))
            self.blocks.append(
                {
                    "block_idx": len(self.blocks),
                    "tag": self._tag,
                    "text": text,
                    "n_chars": len(text),
                    "n_link_chars": len(link_text),
                }
            )
        self._parts = []
        self._link_parts = []

    def handle_starttag(self, tag, attrs):  # noqa: D102
        if tag in SKIP_TAGS:
            self._skip += 1
            return
        if tag == "a":
            self._link += 1
        if tag in BLOCK_TAGS:
            self._flush()
            self._tag = tag

    def handle_endtag(self, tag):  # noqa: D102
        if tag in SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if tag == "a":
            self._link = max(0, self._link - 1)
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):  # noqa: D102
        if self._skip:
            return
        self._parts.append(data)
        if self._link:
            self._link_parts.append(data)


def extract_blocks_py(html: str) -> list[dict]:
    """Parse one document; returns the ordered block dicts. The pure-
    Python core the Arrow UDF batches over — unit-testable without a
    session."""
    p = _BlockParser()
    p.feed(html or "")
    p.close()
    p._flush()  # trailing text outside any closed block
    return p.blocks


# ---------------------------------------------------------------------------
# Spark plumbing
# ---------------------------------------------------------------------------

BLOCKS_SCHEMA = (
    "array<struct<block_idx: int, tag: string, text: string, "
    "n_chars: int, n_link_chars: int>>"
)


def html_parse_blocks(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, html) → (id, blocks) with blocks the nested array above.
    ``mapInArrow``, map-only — the parse is the only Python; every
    downstream gate/reassembly stays in Catalyst."""
    import pyarrow as pa

    block_t = pa.struct(
        [
            ("block_idx", pa.int32()),
            ("tag", pa.string()),
            ("text", pa.string()),
            ("n_chars", pa.int32()),
            ("n_link_chars", pa.int32()),
        ]
    )

    def _parse(batches: Iterable["pa.RecordBatch"]):
        for batch in batches:
            ids = batch.column(0)
            htmls = batch.column(1).to_pylist()
            out = [extract_blocks_py(h) for h in htmls]
            yield pa.record_batch(
                [ids, pa.array(out, type=pa.list_(block_t))],
                names=[id_col, "blocks"],
            )

    return df.select(id_col, html_col).mapInArrow(
        _parse, f"{id_col} long, blocks {BLOCKS_SCHEMA}"
    )


def block_keep_pred(
    b: Column,
    min_chars: int = 10,
    link_density_num: int = 1,
    link_density_den: int = 2,
    drop_tags: tuple = DROP_TAGS,
) -> Column:
    """Catalyst boilerplate predicate over one block struct: keep iff
    not a structural-boilerplate tag, at least ``min_chars`` collapsed
    chars, and link density ≤ num/den by integer cross-multiplication
    (exact on both engines; default 1/2)."""
    tag_ok = (
        ~b["tag"].isin(*drop_tags) if drop_tags else F.lit(True)
    )
    return (
        tag_ok
        & (b["n_chars"] >= F.lit(min_chars))
        & (
            b["n_link_chars"] * F.lit(link_density_den)
            <= b["n_chars"] * F.lit(link_density_num)
        )
    )


def html_extract_blocks(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Exploded per-block frame (id, block_idx, tag, text, n_chars,
    n_link_chars) — the inspection/per-block-analytics view; a narrow
    explode of the nested parse, still shuffle-free."""
    parsed = html_parse_blocks(df, html_col, id_col)
    b = F.explode("blocks").alias("b")
    return parsed.select(id_col, b).select(
        id_col,
        F.col("b.block_idx").alias("block_idx"),
        F.col("b.tag").alias("tag"),
        F.col("b.text").alias("text"),
        F.col("b.n_chars").alias("n_chars"),
        F.col("b.n_link_chars").alias("n_link_chars"),
    )


def html_extract_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_chars: int = 10,
    link_density_num: int = 1,
    link_density_den: int = 2,
    drop_tags: tuple = DROP_TAGS,
) -> DataFrame:
    """Full extraction: parse → boilerplate-gate → reassemble kept
    blocks with newline boundaries. Zero shuffles (array lambdas on
    the map-side parse output). Output: (id, extracted,
    n_blocks_raw, n_blocks_kept); extracted = '' when nothing
    survives — the doc ROW survives so corpus accounting stays exact."""
    parsed = html_parse_blocks(df, html_col, id_col)
    kept = F.filter(
        F.col("blocks"),
        lambda b: block_keep_pred(
            b, min_chars, link_density_num, link_density_den, drop_tags
        ),
    )
    return parsed.select(
        id_col,
        F.array_join(
            F.transform(kept, lambda b: b["text"]), "\n"
        ).alias("extracted"),
        F.size("blocks").cast("int").alias("n_blocks_raw"),
        F.size(kept).cast("int").alias("n_blocks_kept"),
    )


# ---------------------------------------------------------------------------
# deterministic demo corpus (render + arithmetic oracle)
# ---------------------------------------------------------------------------

#: Literal pieces of the rendered test page, shared between the Spark
#: renderer and the DuckDB block predictor so they can never drift.
DEMO_NAV_TEXT = "Home | About"
DEMO_NAV_LINK_CHARS = 9  # "Home" + "About" collapsed, concatenated
DEMO_FOOTER_PREFIX = "© 2026 Example & Co — id "


def render_demo_html(text: Column, doc_id: Column) -> Column:
    """Deterministic HTML page around a document's text: head with
    title/style/script (script body contains MARKUP — must be treated
    as CDATA), nav link bar (high link density), comment, h1, the
    escaped text as <p>, entity-rich <footer>. Entities exercise
    charref decoding (&copy; &amp; &#8212;); the text round-trips
    through &-escaping."""
    sid = doc_id.cast("string")
    esc = F.replace(
        F.replace(
            F.replace(text, F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    return F.concat(
        F.lit("<html><head><title>T"),
        sid,
        F.lit(
            "</title><style>p { color: red }</style>"
            '<script>var s = "<p>not text</p>";</script></head>'
            '<body><nav><a href="/">Home</a> | '
            '<a href="/about">About</a></nav>'
            "<!-- boilerplate comment --><h1>Doc "
        ),
        sid,
        F.lit("</h1><p>"),
        esc,
        F.lit("</p><footer>&copy; 2026 Example &amp; Co &#8212; id "),
        sid,
        F.lit("</footer></body></html>"),
    )


def demo_blocks_sql(table: str = "documents") -> str:
    """DuckDB prediction of ``extract_blocks_py`` over the rendered
    page: 5 blocks per doc (title, nav, h1, p, footer), each with its
    exact text, length, and link-char count — block indices shift down
    when the collapsed text is empty (the parser drops empty blocks).
    Collapse pattern is the same ASCII class the Python side uses."""
    nav = DEMO_NAV_TEXT.replace("'", "''")
    foot = DEMO_FOOTER_PREFIX.replace("'", "''")
    return f"""
WITH demo_src AS (
  SELECT doc_id,
         trim(regexp_replace(text, '[ \\t\\n\\r\\f\\v]+', ' ', 'g'), ' ')
           AS ptext
  FROM {table} WHERE text IS NOT NULL
)
SELECT doc_id, block_idx, tag, text,
       CAST(length(text) AS INT) AS n_chars,
       CAST(n_link AS INT) AS n_link_chars
FROM (
  SELECT doc_id, 0 AS block_idx, 'title' AS tag,
         'T' || CAST(doc_id AS VARCHAR) AS text, 0 AS n_link
  FROM demo_src
  UNION ALL
  SELECT doc_id, 1, 'nav', '{nav}', {DEMO_NAV_LINK_CHARS} FROM demo_src
  UNION ALL
  SELECT doc_id, 2, 'h1', 'Doc ' || CAST(doc_id AS VARCHAR), 0
  FROM demo_src
  UNION ALL
  SELECT doc_id, 3, 'p', ptext, 0 FROM demo_src WHERE ptext <> ''
  UNION ALL
  SELECT doc_id, CASE WHEN ptext <> '' THEN 4 ELSE 3 END, 'footer',
         '{foot}' || CAST(doc_id AS VARCHAR), 0
  FROM demo_src
)
"""


def boilerplate_keep_sql(
    min_chars: int = 10,
    link_density_num: int = 1,
    link_density_den: int = 2,
    drop_tags: tuple = DROP_TAGS,
) -> str:
    """The gate predicate as a DuckDB WHERE fragment over a block row
    (tag, text, n_link_chars) — the same integer arithmetic as
    ``block_keep_pred``."""
    tags = ", ".join("'" + t.replace("'", "''") + "'" for t in drop_tags)
    return (
        f"tag NOT IN ({tags}) AND length(text) >= {min_chars} "
        f"AND n_link_chars * {link_density_den} "
        f"<= length(text) * {link_density_num}"
    )
