"""Byte-level BPE with a REAL-FORMAT vocabulary loader (VERDICT r11
next #1): the standard ``merges.txt`` / ``vocab.json`` released-
tokenizer format, GPT-2-style byte-level pre-tokenization, and a
real-size (tens-of-thousands-of-merges) pinned table driven through
the O(1)-plan-depth distinct-word path of operators/bpe.py.

Three public pieces:

1. **Format loaders** — ``parse_merges_txt`` / ``parse_vocab_json``
   read the exact on-disk format released tokenizers ship (a
   ``#version`` header line, one space-separated merge pair per line;
   a ``{token: id}`` JSON object). A user with a real released
   ``merges.txt`` (e.g. GPT-2's) loads it with these and passes the
   result to ``bpe_token_count_bytes`` unchanged.

2. **Byte-level pre-tokenization** — ``bytes_to_unicode`` is the
   published GPT-2 byte-to-unicode bijection (reimplemented from the
   public spec: printable latin bytes map to themselves, every other
   byte to 256+n in byte order, so ``' '``→``'Ġ'`` (U+0120),
   ``'\\n'``→``'Ċ'``, ``'\\t'``→``'ĉ'``), and ``GPT2_SPLIT_PATTERN``
   is the published pre-tokenizer regex. Merges are expressed in the
   byte-encoded alphabet, exactly as released merges.txt files are.

3. **The Spark plan** — ``bpe_token_count_bytes`` reuses the
   large-vocab shape (operators/bpe.py:254): explode pre-tokens →
   DISTINCT word → Arrow-batched byte-encode + classic merge loop
   (Python work per distinct word only — Zipf makes that orders of
   magnitude below corpus size at 100 TB) → join counts back. Plan
   depth is constant in vocab size; the only Python is one memoized
   encode per distinct word.

The DuckDB oracle (``byte_vocab_count_sql``) replays the identical
computation with one extra, provably result-neutral trick so a
real-size table stays tractable: a BPE token is always a CONTIGUOUS
SUBSTRING of its (byte-encoded) word, so a merge (a, b) can only ever
fire on word w if ``a+b`` occurs in w — the oracle enumerates each
distinct word's substrings (bounded by max merge-target length), joins
them against the merges table, and list_reduce-applies only that
word's candidate merges in global rank order. Pruned chain == full
chain == classic loop is pinned per-word in tests/test_bpe_real.py.

Pattern portability: DuckDB's RE2 has no lookahead, so the cross-
engine queries use ``GPT2_SPLIT_PATTERN_PORTABLE`` — the published
pattern minus the ``\\s+(?!\\S)`` branch. The two are identical on any
text without runs of ≥2 whitespace characters preceding a non-space
(pinned in tests); the full pattern remains the default for the
Spark-only API.

Oracle byte-encoding constraint: the SQL side byte-encodes with
``translate`` over single CODEPOINTS, which equals the per-BYTE
encoder only for ASCII text (one byte per codepoint). The registered
cross-engine query feeds a provably-ASCII corpus; the Spark side
always does true per-byte encoding, so a non-ASCII corpus would
hash-mismatch loudly, never silently diverge.

Reference parity: the reference budgets tokens with a released
tokenizer's vocab files; this loads the same file format into the
same byte-level merge semantics (churn-model-evaluation-platform
keeps token budgeting in its pipeline config — SURVEY §2 text ops).
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import RS, US, _sql_quote, encode_word_classic

# The published GPT-2 pre-tokenizer regex (public spec). Java regex
# supports the lookahead; RE2 (DuckDB) does not — see PORTABLE below.
GPT2_SPLIT_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
)

# Identical to the published pattern on text with no ≥2-whitespace run
# followed by non-space (pinned in tests/test_bpe_real.py): the
# dropped branch only splits trailing whitespace off a longer run.
GPT2_SPLIT_PATTERN_PORTABLE = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)

_VOCAB_DIR = os.path.join(os.path.dirname(__file__), "vocab_real")


def py_pattern(pattern: str) -> str:
    """The same pattern in Python ``re`` flavor (no unicode property
    classes there). The negated class must be rewritten as a WHOLE —
    substituting ``[^\\W\\d_]`` inside ``[^\\s\\p{L}\\p{N}]`` would
    nest character classes, which silently mis-parses (it dropped
    every punctuation token before this was pinned). Exactly equal on
    ASCII; cross-flavor equality on the corpus is pinned in
    tests/test_bpe_real.py."""
    return (
        pattern
        # non-space, non-letter, non-number == (non-word or _) & non-space
        .replace(r"[^\s\p{L}\p{N}]", r"(?:[^\w\s]|_)")
        .replace(r"\p{L}", r"[^\W\d_]")
        .replace(r"\p{N}", r"\d")
    )


@lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """The GPT-2 byte→unicode bijection, reimplemented from the public
    algorithm: every byte in the three printable latin ranges
    (``!``–``~``, ``¡``–``¬``, ``®``–``ÿ``) maps to itself; the
    remaining 68 bytes map to 256+n in ascending byte order. Merges in
    released merges.txt files are written in this alphabet."""
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    table: dict[int, str] = {b: chr(b) for b in printable}
    n = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + n)
            n += 1
    return table


def byte_encode(word: str) -> str:
    """UTF-8 bytes of ``word`` through the byte→unicode table — the
    exact alphabet a released merges table is written in."""
    tbl = bytes_to_unicode()
    return "".join(tbl[b] for b in word.encode("utf-8"))


def parse_merges_txt(text: str) -> list[tuple[str, str]]:
    """Parse the standard released ``merges.txt`` format: an optional
    ``#version: ...`` header, then one merge per line as two
    space-separated byte-encoded tokens, rank = line order. Raises on
    malformed lines instead of skipping them (a silently-dropped merge
    would change every downstream token count)."""
    merges: list[tuple[str, str]] = []
    for i, line in enumerate(text.splitlines()):
        if not line.strip():
            continue
        if i == 0 and line.startswith("#version"):
            continue
        parts = line.split(" ")
        if len(parts) != 2 or not parts[0] or not parts[1]:
            raise ValueError(
                f"merges.txt line {i + 1} is not 'a b': {line!r}"
            )
        merges.append((parts[0], parts[1]))
    return merges


def format_merges_txt(merges: list[tuple[str, str]]) -> str:
    """Serialize to the standard format (round-trips parse_merges_txt)."""
    lines = ["#version: 0.2"]
    lines += [f"{a} {b}" for a, b in merges]
    return "\n".join(lines) + "\n"


def parse_vocab_json(text: str) -> dict[str, int]:
    """Parse the standard ``vocab.json`` (token → id). Validates id
    uniqueness — duplicate ids silently corrupt decode tables."""
    vocab = json.loads(text)
    if not isinstance(vocab, dict):
        raise ValueError("vocab.json must be a JSON object {token: id}")
    ids = list(vocab.values())
    if len(set(ids)) != len(ids):
        raise ValueError("vocab.json has duplicate ids")
    return {str(k): int(v) for k, v in vocab.items()}


def build_vocab_json(merges: list[tuple[str, str]]) -> dict[str, int]:
    """The vocab a merges table induces, GPT-2 id layout: the 256 byte
    tokens first (in byte order of the byte→unicode table), then each
    merge's target at 256+rank."""
    tbl = bytes_to_unicode()
    vocab = {tbl[b]: b for b in range(256)}
    for rank, (a, b) in enumerate(merges):
        tok = a + b
        if tok not in vocab:
            vocab[tok] = 256 + rank
    return vocab


@lru_cache(maxsize=1)
def real_merges() -> list[tuple[str, str]]:
    """The pinned real-size vocabulary, loaded THROUGH the standard-
    format parser from the vendored ``vocab_real/merges.txt`` —
    trained to real scale by tools/train_bpe.py --byte-level on the
    sf0.1 rendered corpus (every entry a genuinely trained merge, no
    inventory padding; see the file header). Swapping in an actual
    released merges.txt is a one-line change here."""
    with open(os.path.join(_VOCAB_DIR, "merges.txt"), encoding="utf-8") as f:
        return parse_merges_txt(f.read())


@lru_cache(maxsize=1)
def real_vocab() -> dict[str, int]:
    with open(os.path.join(_VOCAB_DIR, "vocab.json"), encoding="utf-8") as f:
        return parse_vocab_json(f.read())


def encode_word_bytes(
    word: str, rank: dict[tuple[str, str], int]
) -> list[str]:
    """Byte-encode then classic lowest-rank merge loop — the per-
    distinct-word unit of work (reference encoder for tests and the
    mapInArrow hot path alike)."""
    return encode_word_classic(byte_encode(word), rank)


def bpe_token_count_bytes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    merges: list[tuple[str, str]] | None = None,
    pattern: str | None = None,
) -> DataFrame:
    """Per-doc EXACT byte-level token counts under a real-format merges
    table — the distinct-word plan (see module docstring). Docs with
    zero pre-tokens report 0. Plan shape is identical to
    bpe_token_count_vocab (operators/bpe.py:254); only the per-word
    encode differs (byte-encode first, merges in byte alphabet)."""
    merges = real_merges() if merges is None else merges
    pattern = GPT2_SPLIT_PATTERN if pattern is None else pattern
    rank = {m: i for i, m in enumerate(merges)}

    def _encode(batches):
        import pyarrow as pa

        memo: dict[str, int] = {}
        for batch in batches:
            words = batch.column(0).to_pylist()
            out = []
            for w in words:
                n = memo.get(w)
                if n is None:
                    n = len(encode_word_bytes(w, rank))
                    memo[w] = n
                out.append(n)
            yield pa.record_batch(
                [pa.array(words, pa.string()), pa.array(out, pa.int64())],
                names=["w", "n_tokens"],
            )

    words = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)
        ).alias("w"),
    )
    vocab = words.select("w").distinct()
    encoded = vocab.mapInArrow(_encode, "w string, n_tokens long")
    counts = (
        words.join(encoded, "w")
        .groupBy(id_col)
        .agg(F.sum("n_tokens").alias("n_tokens_exact"))
    )
    return (
        df.select(id_col)
        .join(counts, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens_exact"), F.lit(0))
            .cast("long")
            .alias("n_tokens_exact"),
        )
    )


def _sql_chr_concat(s: str) -> str:
    """A SQL expression producing ``s`` via chr() concatenation —
    control characters and non-ASCII survive any SQL-literal
    transport."""
    return " || ".join(f"chr({ord(c)})" for c in s) if s else "''"


def byte_encode_translate_sql(expr: str) -> str:
    """DuckDB expression byte-encoding an ASCII string column: every
    remapped single-byte codepoint (0x01–0x20, 0x7F) translated to its
    byte-encoder image. Equals ``byte_encode`` on ASCII text exactly
    (one byte per codepoint); NUL (0x00) cannot ride a translate and
    does not occur in parquet-borne text here."""
    tbl = bytes_to_unicode()
    ctrl = [b for b in range(1, 128) if tbl[b] != chr(b)]
    frm = "".join(chr(b) for b in ctrl)
    to = "".join(tbl[b] for b in ctrl)
    return f"translate({expr}, {_sql_chr_concat(frm)}, {_sql_chr_concat(to)})"


def byte_vocab_count_sql(
    corpus_sql: str,
    merges: list[tuple[str, str]] | None = None,
    pattern: str = GPT2_SPLIT_PATTERN_PORTABLE,
) -> str:
    """The DuckDB replay of ``bpe_token_count_bytes`` over
    ``corpus_sql`` (a subquery yielding ``(doc_id, text)``): same
    pre-tokenization, same distinct-word discipline, same byte-encoded
    merge semantics — applied per word as a rank-ordered replace chain
    over that word's CANDIDATE merges only (the substring-pruning
    argument in the module docstring; chain == classic loop pinned in
    tests). The merges table inlines as one US/RS-separated literal
    (r11's proven transport, operators/bpe.py vocab_count_sql)."""
    merges = real_merges() if merges is None else merges
    mega = RS.join(f"{a}{US}{b}" for a, b in merges)
    maxl = max(len(a) + len(b) for a, b in merges)
    pat = _sql_quote(pattern)
    return f"""
WITH m0 AS (
  SELECT unnest(str_split({_sql_quote(mega)}, chr(30))) AS p,
         generate_subscripts(str_split({_sql_quote(mega)}, chr(30)), 1)
           AS rank
),
m2 AS (
  SELECT rank,
         str_split(p, chr(31))[1] || str_split(p, chr(31))[2] AS tgt,
         chr(31) || str_split(p, chr(31))[1] || chr(31)
           || chr(31) || str_split(p, chr(31))[2] || chr(31)
           || chr(30)
           || chr(31) || str_split(p, chr(31))[1]
           || str_split(p, chr(31))[2] || chr(31) AS rep
  FROM m0
),
corpus AS ({corpus_sql}),
words AS (
  SELECT doc_id, unnest(regexp_extract_all(text, {pat})) AS w
  FROM corpus
),
enc_w AS (
  SELECT w, {byte_encode_translate_sql("w")} AS ew
  FROM (SELECT DISTINCT w FROM words)
),
subs AS (
  SELECT w, unnest(list_distinct(flatten(list_transform(
           generate_series(1, length(ew)),
           st -> list_transform(
             generate_series(2, least({maxl}, length(ew) - st + 1)),
             ln -> substr(ew, st, ln)))))) AS s
  FROM enc_w
),
cand AS (
  SELECT s.w, array_agg(m.rep ORDER BY m.rank) AS reps
  FROM subs s JOIN m2 m ON m.tgt = s.s
  GROUP BY s.w
),
enc AS (
  SELECT w,
         CAST((length(fs) - length(replace(fs, chr(31), ''))) / 2
              AS BIGINT) AS n_tokens
  FROM (
    SELECT e.w,
           list_reduce(
             list_prepend(
               regexp_replace(e.ew, '(.)', chr(31) || '\\1' || chr(31),
                              'g'),
               coalesce(c.reps, [])
             ),
             (acc, r) -> replace(acc, str_split(r, chr(30))[1],
                                 str_split(r, chr(30))[2])
           ) AS fs
    FROM enc_w e LEFT JOIN cand c USING (w))
)
SELECT d.doc_id,
       COALESCE(CAST(t.n AS BIGINT), 0) AS n_tokens_exact
FROM corpus d
LEFT JOIN (
  SELECT w.doc_id, CAST(SUM(e.n_tokens) AS BIGINT) AS n
  FROM words w JOIN enc e USING (w)
  GROUP BY w.doc_id
) t ON t.doc_id = d.doc_id
"""


def bpe_tokenize_ids(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    merges: list[tuple[str, str]] | None = None,
    vocab: dict[str, int] | None = None,
    pattern: str | None = None,
) -> DataFrame:
    """TOKENIZE TO IDS — the step a training-data pipeline actually
    runs (counts budget the mixture; ids feed the model): the exploded
    token-id stream ``(id_col, wpos, ti, token_id)`` where ``wpos`` is
    the pre-token's 1-based position in the doc and ``ti`` the token's
    1-based position within the pre-token (the pair totally orders the
    doc's tokens). Same distinct-word plan as the counts
    (explode+posexplode → DISTINCT word → Arrow-batched byte-encode +
    classic merge loop returning the token LIST → id lookup → join
    back → posexplode ids); closure is structural — every produced
    token is a merge target or a single byte char, both in the vocab
    by construction — so a missing id raises in the executor rather
    than silently dropping a token."""
    merges = real_merges() if merges is None else merges
    vocab = (
        real_vocab()
        if vocab is None and merges is real_merges()
        else (build_vocab_json(merges) if vocab is None else vocab)
    )
    pattern = GPT2_SPLIT_PATTERN if pattern is None else pattern
    rank = {m: i for i, m in enumerate(merges)}

    def _encode(batches):
        import pyarrow as pa

        memo: dict[str, list[int]] = {}
        for batch in batches:
            words = batch.column(0).to_pylist()
            out = []
            for w in words:
                ids = memo.get(w)
                if ids is None:
                    ids = [vocab[t] for t in encode_word_bytes(w, rank)]
                    memo[w] = ids
                out.append(ids)
            yield pa.record_batch(
                [
                    pa.array(words, pa.string()),
                    pa.array(out, pa.list_(pa.int64())),
                ],
                names=["w", "ids"],
            )

    words = df.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)
        ).alias("wp0", "w"),
    ).select(id_col, (F.col("wp0") + 1).alias("wpos"), "w")
    encoded = (
        words.select("w")
        .distinct()
        .mapInArrow(_encode, "w string, ids array<long>")
    )
    return (
        words.join(encoded, "w")
        .select(
            id_col,
            "wpos",
            F.posexplode("ids").alias("ti0", "token_id"),
        )
        .select(
            id_col,
            "wpos",
            (F.col("ti0") + 1).alias("ti"),
            "token_id",
        )
    )


def byte_tokenize_ids_sql(
    corpus_sql: str,
    merges: list[tuple[str, str]] | None = None,
    pattern: str = GPT2_SPLIT_PATTERN_PORTABLE,
) -> str:
    """DuckDB replay of ``bpe_tokenize_ids``: the same candidate-pruned
    replace chain per distinct word, the final wrapped form split back
    into the token list (the bpe_tokens recipe: inter-token US pairs →
    RS, strip US, split), and ids resolved from the SAME construction
    as ``build_vocab_json`` — byte tokens carry their byte id (a
    merge target is ≥2 codepoints, so the two id spaces cannot
    collide), merge targets carry 256+rank with the FIRST producing
    rank winning (MIN over duplicates)."""
    merges = real_merges() if merges is None else merges
    mega = RS.join(f"{a}{US}{b}" for a, b in merges)
    maxl = max(len(a) + len(b) for a, b in merges)
    tbl = bytes_to_unicode()
    bytestr = "".join(tbl[b] for b in range(256))
    pat = _sql_quote(pattern)
    return f"""
WITH m0 AS (
  SELECT unnest(str_split({_sql_quote(mega)}, chr(30))) AS p,
         generate_subscripts(str_split({_sql_quote(mega)}, chr(30)), 1)
           AS rank
),
m2 AS (
  SELECT rank,
         str_split(p, chr(31))[1] || str_split(p, chr(31))[2] AS tgt,
         chr(31) || str_split(p, chr(31))[1] || chr(31)
           || chr(31) || str_split(p, chr(31))[2] || chr(31)
           || chr(30)
           || chr(31) || str_split(p, chr(31))[1]
           || str_split(p, chr(31))[2] || chr(31) AS rep
  FROM m0
),
corpus AS ({corpus_sql}),
words AS (
  SELECT doc_id,
         generate_subscripts(regexp_extract_all(text, {pat}), 1) AS wpos,
         unnest(regexp_extract_all(text, {pat})) AS w
  FROM corpus
),
enc_w AS (
  SELECT w, {byte_encode_translate_sql("w")} AS ew
  FROM (SELECT DISTINCT w FROM words)
),
subs AS (
  SELECT w, unnest(list_distinct(flatten(list_transform(
           generate_series(1, length(ew)),
           st -> list_transform(
             generate_series(2, least({maxl}, length(ew) - st + 1)),
             ln -> substr(ew, st, ln)))))) AS s
  FROM enc_w
),
cand AS (
  SELECT s.w, array_agg(m.rep ORDER BY m.rank) AS reps
  FROM subs s JOIN m2 m ON m.tgt = s.s
  GROUP BY s.w
),
fs AS (
  SELECT e.w,
         list_reduce(
           list_prepend(
             regexp_replace(e.ew, '(.)', chr(31) || '\\1' || chr(31),
                            'g'),
             coalesce(c.reps, [])
           ),
           (acc, r) -> replace(acc, str_split(r, chr(30))[1],
                               str_split(r, chr(30))[2])
         ) AS s
  FROM enc_w e LEFT JOIN cand c USING (w)
),
toks AS (
  SELECT w, generate_subscripts(tl, 1) AS ti, unnest(tl) AS tok
  FROM (
    SELECT w, str_split(replace(replace(s, chr(31) || chr(31), chr(30)),
                                chr(31), ''), chr(30)) AS tl
    FROM fs)
),
vocab AS (
  SELECT tok, MIN(id) AS tid FROM (
    SELECT str_split(p, chr(31))[1] || str_split(p, chr(31))[2] AS tok,
           255 + rank AS id
    FROM m0
    UNION ALL
    SELECT unnest(str_split({_sql_quote(bytestr)}, '')) AS tok,
           generate_subscripts(str_split({_sql_quote(bytestr)}, ''), 1) - 1
             AS id
  ) GROUP BY tok
)
SELECT ws.doc_id, CAST(ws.wpos AS BIGINT) AS wpos,
       CAST(t.ti AS BIGINT) AS ti,
       CAST(v.tid AS BIGINT) AS token_id
FROM words ws JOIN toks t USING (w) JOIN vocab v ON v.tok = t.tok
"""


def byte_decode(s: str) -> str:
    """Inverse of ``byte_encode``: map each codepoint back to its byte
    and UTF-8-decode — the Python reference for detokenization."""
    tbl = bytes_to_unicode()
    inv = {c: b for b, c in tbl.items()}
    return bytes(inv[c] for c in s).decode("utf-8")


def bpe_detokenize(
    ids_df: DataFrame,
    vocab: dict[str, int] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """DETOKENIZE the ``bpe_tokenize_ids`` stream back to text —
    ``(id_col, text_rebuilt)``, one row per doc: tokens resolve through
    a BROADCAST id→token frame (50k rows ≈ 1 MB — never a shuffle on
    the vocab), order is the (wpos, ti) struct sort inside one grouped
    ``collect_list`` (per-doc state, bounded by doc length), and the
    byte decode is one ``translate`` over the single-byte remapped
    chars (Ġ→space etc.) — exact for ASCII text, the same constraint
    the tokenize oracle documents; a non-ASCII corpus round-trips
    through the Python ``byte_decode`` instead. Tokenize→detokenize is
    the IDENTITY on the pre-token partition of the text, which makes
    the cross-engine oracle of ``detokenize_real`` simply the source
    text — the strongest end-to-end pin the tokenizer stack can get."""
    vocab = real_vocab() if vocab is None else vocab
    spark = ids_df.sparkSession
    vdf = spark.createDataFrame(
        [(int(i), t) for t, i in vocab.items()],
        "token_id long, _tok string",
    )
    tbl = bytes_to_unicode()
    remapped = [(c, b) for b, c in tbl.items() if b < 128 and c != chr(b)]
    frm = "".join(c for c, _ in remapped)
    to = "".join(chr(b) for _, b in remapped)
    return (
        ids_df.join(F.broadcast(vdf), "token_id")
        .groupBy(id_col)
        .agg(
            F.translate(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("wpos", "ti", "_tok")
                            )
                        ),
                        lambda s: s["_tok"],
                    ),
                ),
                frm,
                to,
            ).alias("text_rebuilt")
        )
    )


def tokenizer_fertility_bytes(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    merges: "list[tuple[str, str]] | None" = None,
    pattern: str | None = None,
) -> DataFrame:
    """Tokenizer FERTILITY audit per corpus slice under the real-format
    vocabulary: tokens-per-whitespace-word (the standard fertility
    metric — how many subwords the tokenizer spends per word; ~1 on
    in-domain English, >2 signals out-of-vocabulary text) and
    bytes-per-token (the compression ratio that sets the real cost of
    a token budget). The number a data-mixing pipeline inspects per
    LANGUAGE/SOURCE before committing token-budget weights — a
    vocabulary trained on English spends 2-4x more tokens per byte on
    unseen scripts, silently shrinking those slices' effective share.

    Rides the O(1)-plan-depth distinct-word path
    (``bpe_token_count_bytes``); the per-doc word/byte side is one
    embarrassingly-parallel projection, and the group-by is
    |slices|-row. Ratios rounded to 6 (cross-engine division parity).
    """
    counts = bpe_token_count_bytes(
        df, text_col=text_col, id_col=id_col, merges=merges,
        pattern=pattern,
    )
    sides = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.col(group_col),
        F.size(F.split(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")), " ")).alias("__words"),
        F.octet_length(F.col(text_col)).alias("__bytes"),
    )
    return (
        sides.join(counts, id_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens_exact").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum("n_tokens_exact") / F.sum("__words"), 6
            ).alias("fertility"),
            F.round(
                F.sum("__bytes") / F.sum("n_tokens_exact"), 6
            ).alias("bytes_per_token"),
        )
    )


def tokenizer_fertility_sql(
    corpus_sql: str,
    group_col: str = "lang",
    merges: "list[tuple[str, str]] | None" = None,
    pattern: str = GPT2_SPLIT_PATTERN_PORTABLE,
) -> str:
    """DuckDB replay of ``tokenizer_fertility_bytes``: the per-doc
    token counts come from the verbatim ``byte_vocab_count_sql`` replay
    over ``corpus_sql`` (which must yield (doc_id, text, <group_col>));
    words/bytes/ratios re-derived with identical expressions."""
    counts = byte_vocab_count_sql(
        f"SELECT doc_id, text FROM ({corpus_sql})",
        merges=merges,
        pattern=pattern,
    )
    return f"""
WITH corpus AS ({corpus_sql}),
counts AS ({counts}),
sides AS (
  SELECT doc_id, {group_col},
         len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))
           AS words,
         octet_length(CAST(text AS BLOB)) AS bytes
  FROM corpus WHERE text IS NOT NULL
)
SELECT {group_col},
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens_exact) AS BIGINT) AS n_tokens,
       round(sum(n_tokens_exact) / sum(words), 6) AS fertility,
       round(sum(bytes) / sum(n_tokens_exact), 6) AS bytes_per_token
FROM sides JOIN counts USING (doc_id)
GROUP BY {group_col}
"""
