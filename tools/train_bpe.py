"""Deterministic BPE trainer for the PINNED merges table in
operators/bpe.py (VERDICT r9 next #4).

Trains on the fixture corpus (sf0.001 documents) with classic
Sennrich-style BPE: count adjacent symbol pairs over the pre-tokenized
word-frequency table, merge the most frequent pair, repeat. Ties break
by (count desc, pair lexicographic) so the output is a pure function of
the corpus. Run once; the result is pinned as a literal — query-time
never retrains (same posture as the pinned PQ codebooks).

Usage: python tools/train_bpe.py [n_merges] [sf_dir]
"""

from __future__ import annotations

import re
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from churn_model_evaluation_platform_spark.operators.text import (  # noqa: E402
    BPE_TOKEN_PATTERN,
)


def train(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    pat = re.compile(BPE_TOKEN_PATTERN)
    words = Counter()
    for t in texts:
        for w in pat.findall(t or ""):
            words[tuple(w)] += 1

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, cnt in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_words: Counter = Counter()
        for sym, cnt in words.items():
            out, i = [], 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] += cnt
        words = new_words
    return merges


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    merges = train(texts, n)
    print("BPE_MERGES: list[tuple[str, str]] = [")
    for a, b in merges:
        print(f"    ({a!r}, {b!r}),")
    print("]")


if __name__ == "__main__":
    main()
