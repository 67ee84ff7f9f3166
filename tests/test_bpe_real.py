"""Real-format tokenizer vocabulary (operators/bpe_vocab.py, round 12):
the standard merges.txt / vocab.json loaders, the GPT-2 byte-level
pre-tokenization, the 50k-merge trained table, and the equivalences the
DuckDB oracle leans on (pruned replace chain == full chain == classic
merge loop; RE2 == Java == Python pattern flavors on the corpus).
"""

from __future__ import annotations

import json
import re

import duckdb
import pytest

from churn_model_evaluation_platform_spark.operators.bpe import (
    US,
    encode_word_classic,
)
from churn_model_evaluation_platform_spark.operators.bpe_vocab import (
    GPT2_SPLIT_PATTERN,
    GPT2_SPLIT_PATTERN_PORTABLE,
    bpe_token_count_bytes,
    build_vocab_json,
    byte_encode,
    bytes_to_unicode,
    encode_word_bytes,
    format_merges_txt,
    parse_merges_txt,
    parse_vocab_json,
    py_pattern,
    real_merges,
    real_vocab,
)

# ---------------------------------------------------------------------------
# byte encoder
# ---------------------------------------------------------------------------


def _reference_bytes_to_unicode() -> dict[int, str]:
    """Independent reimplementation of the published GPT-2 algorithm
    (parallel-list construction, as the public source describes it) —
    the module's table must match it byte-for-byte."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def test_byte_encoder_matches_reference_implementation():
    assert bytes_to_unicode() == _reference_bytes_to_unicode()


def test_byte_encoder_pinned_published_values():
    t = bytes_to_unicode()
    assert len(t) == 256
    assert len(set(t.values())) == 256  # bijection
    assert t[ord(" ")] == "Ġ"  # Ġ — the famous leading-space mark
    assert t[ord("\n")] == "Ċ"  # Ċ
    assert t[ord("\t")] == "ĉ"  # ĉ
    assert t[0] == "Ā"  # Ā: first excluded byte
    assert t[ord("!")] == "!" and t[ord("~")] == "~"  # printable identity
    assert t[0xFF] == "\xff" and t[0xAD] == "Ń"  # soft hyphen excluded


def test_byte_encode_multibyte_utf8_is_per_byte():
    # 'é' is 2 UTF-8 bytes (0xC3 0xA9) — both in the printable ranges
    assert byte_encode("é") == "\xc3\xa9"
    assert byte_encode(" a") == "Ġa"


# ---------------------------------------------------------------------------
# format loaders
# ---------------------------------------------------------------------------


def test_merges_txt_round_trip():
    merges = [("Ġ", "1"), ("e", "r"), ("Ġ1", "2")]
    assert parse_merges_txt(format_merges_txt(merges)) == merges


def test_merges_txt_header_and_blank_lines_tolerated():
    assert parse_merges_txt("#version: 0.2\na b\n\nc d\n") == [
        ("a", "b"),
        ("c", "d"),
    ]


def test_merges_txt_malformed_line_raises():
    with pytest.raises(ValueError, match="line 2"):
        parse_merges_txt("#version: 0.2\na b c\n")


def test_vocab_json_round_trip_and_duplicate_ids_raise():
    v = build_vocab_json([("a", "b")])
    assert parse_vocab_json(json.dumps(v)) == v
    with pytest.raises(ValueError, match="duplicate"):
        parse_vocab_json('{"a": 1, "b": 1}')


def test_real_table_loads_through_the_standard_parser():
    merges = real_merges()
    assert len(merges) == 50_000
    vocab = real_vocab()
    assert len(vocab) >= 256 + 1
    # GPT-2 id layout: byte tokens 0..255 first, then 256+rank
    tbl = bytes_to_unicode()
    assert vocab[tbl[ord(" ")]] == ord(" ")
    a, b = merges[0]
    assert vocab[a + b] == 256


def test_real_table_is_valid_bpe():
    """Every merge's operands must exist before its rank (a base byte
    char or an earlier merge's target) — the property that makes the
    rank-ordered replace chain equal the classic lowest-rank loop."""
    tbl = bytes_to_unicode()
    known = set(tbl.values())
    for a, b in real_merges():
        assert a in known and b in known, (a, b)
        known.add(a + b)


# ---------------------------------------------------------------------------
# chain == classic loop == substring-pruned chain (the oracle's trick)
# ---------------------------------------------------------------------------


def _chain_encode(ew: str, merges: list[tuple[str, str]]) -> int:
    """Rank-ordered global replace chain over the wrapped form — the
    DuckDB oracle's exact computation, in Python."""
    s = "".join(US + c + US for c in ew)
    for a, b in merges:
        s = s.replace(US + a + US + US + b + US, US + a + b + US)
    return s.count(US) // 2


_SAMPLE_WORDS = [
    " 12345",
    " 899",
    " 1998",
    "10",
    "-",
    " priority",
    " customer",
    "order",
    " MEDIUM",
    " spark",
    "LOW",
    " 5",
    " 149999",
    " 007",
    "x",
    "",
][:-1]  # drop the empty string: never a pre-token


def test_pruned_chain_equals_full_chain_equals_classic_loop():
    merges = real_merges()
    rank = {m: i for i, m in enumerate(merges)}
    for w in _SAMPLE_WORDS:
        ew = byte_encode(w)
        full = _chain_encode(ew, merges)
        pruned = _chain_encode(
            ew, [m for m in merges if (m[0] + m[1]) in ew]
        )
        classic = len(encode_word_classic(ew, rank))
        assert full == pruned == classic, (w, full, pruned, classic)


def test_encode_closure_every_token_in_vocab():
    merges = real_merges()
    rank = {m: i for i, m in enumerate(merges)}
    vocab = real_vocab()
    for w in _SAMPLE_WORDS:
        for tok in encode_word_bytes(w, rank):
            assert tok in vocab, (w, tok)


# ---------------------------------------------------------------------------
# pattern flavors: Java (Spark) == RE2 (DuckDB) == Python on the corpus
# ---------------------------------------------------------------------------

_CORPUS_LIKE = [
    "order 12345 customer 899 date 1998-10-03 status P priority 5-LOW",
    "the fast key order sort table scan merge",
    "event 42 user 7 click",
    "it's a test, really: 3.14 items!",
]


def _re2_findall(text: str, pattern: str) -> list[str]:
    return duckdb.sql(
        "SELECT regexp_extract_all(?, ?)", params=[text, pattern]
    ).fetchone()[0]


def _java_findall(spark, text: str, pattern: str) -> list[str]:
    from pyspark.sql import functions as F

    return (
        spark.range(1)
        .select(
            F.regexp_extract_all(
                F.lit(text), F.lit(pattern), 0
            ).alias("t")
        )
        .collect()[0]["t"]
    )


def test_portable_pattern_three_flavors_agree(spark):
    pyc = re.compile(py_pattern(GPT2_SPLIT_PATTERN_PORTABLE))
    for t in _CORPUS_LIKE:
        py = pyc.findall(t)
        re2 = _re2_findall(t, GPT2_SPLIT_PATTERN_PORTABLE)
        jav = _java_findall(spark, t, GPT2_SPLIT_PATTERN_PORTABLE)
        assert py == re2 == jav, (t, py, re2, jav)


def test_portable_vs_full_gpt2_pattern():
    """Identical wherever no ≥2-whitespace run precedes a non-space;
    the known divergence case is pinned so the tradeoff stays
    visible."""
    full = re.compile(py_pattern(GPT2_SPLIT_PATTERN))
    port = re.compile(py_pattern(GPT2_SPLIT_PATTERN_PORTABLE))
    for t in _CORPUS_LIKE + ["trailing space ", "tab\tsep"]:
        assert full.findall(t) == port.findall(t), t
    # the divergence: GPT-2 leaves the LAST space to lead the next word
    t = "a  b"
    assert full.findall(t) == ["a", " ", " b"]
    assert port.findall(t) == ["a", "  ", "b"]


# ---------------------------------------------------------------------------
# the Spark operator
# ---------------------------------------------------------------------------


def test_bpe_token_count_bytes_matches_python_reference(spark):
    merges = real_merges()
    rank = {m: i for i, m in enumerate(merges)}
    pyc = re.compile(py_pattern(GPT2_SPLIT_PATTERN_PORTABLE))
    docs = [(i, t) for i, t in enumerate(_CORPUS_LIKE)] + [(99, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_tokens_exact"]
        for r in bpe_token_count_bytes(
            df, pattern=GPT2_SPLIT_PATTERN_PORTABLE
        ).collect()
    }
    for i, t in docs:
        want = sum(len(encode_word_bytes(w, rank)) for w in pyc.findall(t))
        assert got[i] == want, (t, got[i], want)
    assert got[99] == 0  # empty text: zero pre-tokens


def test_distinct_word_plan_has_no_python_on_doc_rows(spark):
    """The plan's only Python stage (ArrowEvalPython / mapInArrow)
    must sit on the DISTINCT-word side, after the explode+distinct —
    never over doc rows."""
    df = spark.createDataFrame(
        [(1, "order 12 x"), (2, "order 12 x")], "doc_id long, text string"
    )
    plan = bpe_token_count_bytes(
        df, pattern=GPT2_SPLIT_PATTERN_PORTABLE
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan or "ArrowEval" in plan
    # the Arrow stage consumes the distinct-word aggregate, not the raw
    # generate: distinct (HashAggregate) appears below it in the tree
    arrow_at = plan.find("MapInArrow")
    assert "HashAggregate" in plan[arrow_at:]


def test_tokenize_ids_round_trips_and_agrees_with_counts(spark):
    """Decoding the id stream through the inverted vocab must
    reconstruct each pre-token's byte-encoded text exactly, and the id
    stream's per-doc cardinality must equal bpe_token_count_bytes."""
    from churn_model_evaluation_platform_spark.operators.bpe_vocab import (
        bpe_tokenize_ids,
    )

    docs = [(i, t) for i, t in enumerate(_CORPUS_LIKE)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    ids = bpe_tokenize_ids(
        df, pattern=GPT2_SPLIT_PATTERN_PORTABLE
    ).collect()
    inv = {v: k for k, v in real_vocab().items()}
    # rebuild each (doc, wpos) pre-token from its ordered token ids
    by_word: dict = {}
    for r in ids:
        by_word.setdefault((r["doc_id"], r["wpos"]), []).append(
            (r["ti"], inv[r["token_id"]])
        )
    pyc = re.compile(py_pattern(GPT2_SPLIT_PATTERN_PORTABLE))
    for (d, wpos), toks in by_word.items():
        w = pyc.findall(_CORPUS_LIKE[d])[wpos - 1]
        rebuilt = "".join(t for _, t in sorted(toks))
        assert rebuilt == byte_encode(w), (d, wpos, w, rebuilt)
    counts = {
        r["doc_id"]: r["n_tokens_exact"]
        for r in bpe_token_count_bytes(
            df, pattern=GPT2_SPLIT_PATTERN_PORTABLE
        ).collect()
    }
    from collections import Counter

    per_doc = Counter(r["doc_id"] for r in ids)
    assert {d: per_doc.get(d, 0) for d in counts} == counts
