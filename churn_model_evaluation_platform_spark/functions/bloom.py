"""Bloom-filter runtime join filter: pre-filter a huge fact table by a
compact bitmap built from the (already filtered) dim-side join keys, so
rows that cannot possibly join never enter the shuffle.

This is the pattern behind Spark's own runtime bloom filter
(spark.sql.optimizer.runtime.bloomFilter.enabled) and Parquet bloom
pushdown, implemented explicitly so it (a) works on any expression, not
just InjectRuntimeFilter's supported shapes, and (b) is inspectable in
the plan. Correctness is unaffected by construction: a Bloom filter has
no false negatives, and false positives are eliminated by the exact
join that follows — so callers can verify the filtered join against the
plain join bit-for-bit.

Scale notes:
- The build side collects ONLY the distinct set bit positions (<= m
  bits, default 8 KiB of bitmap) — broadcast-sized by definition,
  independent of dim row count.
- The probe side evaluates k hash + bitmask expressions per row, fully
  JVM-side (xxhash64 + shift/AND via whole-stage codegen); no Python,
  no join, no shuffle — it runs inside the scan stage right after the
  pushed filters.
- At 100 TB the win is shuffle-volume: with a selective dim filter the
  fact shuffle shrinks by roughly the filter's true-negative rate
  (1 - fpr at the chosen m/k/n).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEFAULT_SEEDS = (0x01000193, 0x9E3779B1, 0xC2B2AE35)


def _positions(key: Column, m: int, seeds: tuple[int, ...]) -> list[Column]:
    # pmod: xxhash64 is signed; ((h % m) + m) % m keeps positions in [0, m).
    return [
        ((F.xxhash64(key, F.lit(int(s))) % m) + m) % m for s in seeds
    ]


def bloom_build(
    dim: DataFrame, key: Column | str, m: int = 8192, seeds: tuple[int, ...] = _DEFAULT_SEEDS
) -> list[int]:
    """Build the bitmap (as ``m // 64`` little-endian words) from the dim
    side's keys. One distinct-aggregate job; the result is a driver-side
    list destined for a literal in the probe-side expression (the same
    collect any broadcast build performs, bounded by m bits)."""
    key_col = F.col(key) if isinstance(key, str) else key
    pos_rows = (
        dim.select(F.explode(F.array(*_positions(key_col, m, seeds))).alias("p"))
        .distinct()
        .collect()
    )
    words = [0] * ((m + 63) // 64)
    for r in pos_rows:
        words[r.p // 64] |= 1 << (r.p % 64)
    # Spark longs are signed; fold into two's complement for the literal.
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    key: Column | str,
    words: list[int],
    m: int = 8192,
    seeds: tuple[int, ...] = _DEFAULT_SEEDS,
) -> Column:
    """Predicate column: True iff every one of the k hashed bit
    positions of ``key`` is set in ``words`` (i.e. the key *might* be in
    the build set; false ⇒ definitely not)."""
    key_col = F.col(key) if isinstance(key, str) else key
    # Explicit long cast: a bitmap whose words all happen to fit int32
    # (e.g. an empty or sparse build) would otherwise infer array<int>,
    # and bit_get rejects positions >= 32 on int words.
    bitmap = F.lit(words).cast("array<long>")
    checks = []
    for p in _positions(key_col, m, seeds):
        word = F.element_at(bitmap, (p / F.lit(64)).cast("int") + F.lit(1))
        checks.append(F.bit_get(word, (p % 64).cast("int")) == F.lit(1))
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out
