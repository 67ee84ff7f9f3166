"""Perceptual image dedup — dHash over decoded pixels (VERDICT r13
next #4, the image analog of MinHash a 100 TB multimodal corpus
needs; Krawetz's difference-hash recipe).

Reference parity note: the reference pipeline (churn rows) has no
image analog; this completes the multimodal family's missing dedup
operator next to ``multimodal.decode_png_pixels``/``resize_nearest``.

Recipe, re-derived integer-exact so a DuckDB oracle replays it:

* resize to 10×7 through the REAL ``resize_nearest`` decode path
  (floor index mapping) — 9 horizontal comparisons × 7 rows = a
  **63-bit** fingerprint, so ``1 << bit`` can never overflow signed
  BIGINT on either engine (the bloom-sketch discipline);
* grayscale = the exact integer channel SUM r+g+b (no luma weights,
  no division — monotone for comparisons, bit-identical cross-engine);
* bit (y, x) = gray(y, x+1) > gray(y, x), packed little-endian by
  bit index y·9+x.

Everything after the Arrow decode/resize stays in Catalyst: the
grayscale sums, the 63 comparisons, and the fingerprint packing are
one column expression over the pixel array; candidate pairs come from
``dedup.fingerprint_hamming_pairs`` (7 chunks × 9 bits — pigeonhole
guarantees every pair with hamming ≤ 6 is a candidate).

Scale shape: fingerprinting is map-only (decode+resize is the only
Python, Arrow-batched); the pair join shuffles (chunk, 9-bit key)
buckets — bucket-bounded like MinHash LSH, never corpus².
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .multimodal import resize_nearest

#: resize grid: 9 comparisons x 7 rows = 63 fingerprint bits.
DHASH_W, DHASH_H = 10, 7
DHASH_BITS = (DHASH_W - 1) * DHASH_H


def dhash_bits(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """(id, content) → (id, src_w, src_h, dhash) — the 63-bit
    difference hash; undecodable blobs are dropped (their pixels come
    back NULL from the resize, the degrade-don't-raise rule)."""
    rs = resize_nearest(
        df,
        out_w=DHASH_W,
        out_h=DHASH_H,
        content_col=content_col,
        id_col=id_col,
    )
    px = F.col("pixels")

    def gray_at(p):
        # p: 0-based pixel index Column in the W×H grid
        base = p * 3
        return (
            F.element_at(px, base + 1).cast("bigint")
            + F.element_at(px, base + 2)
            + F.element_at(px, base + 3)
        )

    w = DHASH_W

    def bit_term(acc, i):
        # bit i ↔ (y = i div 9, x = i mod 9): compare pixel (y, x+1)
        # vs (y, x) in the W-wide grid
        y = ((i - i % (w - 1)) / (w - 1)).cast("int")
        x = i % (w - 1)
        p = y * w + x
        return acc + F.when(
            gray_at(p + 1) > gray_at(p),
            # shiftleft's Python wrapper wants a literal bit count;
            # the SQL function accepts a column expression
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"), i.cast("int")
            ),
        ).otherwise(F.lit(0).cast("bigint"))

    # ONE aggregate over the bit indices instead of 63 inlined when-
    # terms: identical values, ~60× smaller expression tree — the
    # 63-term form cost seconds of codegen PER PLAN, which multiplied
    # across the streaming ingest's many small jobs (r14 profile)
    fp = F.aggregate(
        F.sequence(F.lit(0), F.lit(DHASH_BITS - 1)),
        F.lit(0).cast("bigint"),
        bit_term,
    )
    return rs.where(px.isNotNull()).select(
        id_col, "src_w", "src_h", fp.alias("dhash")
    )


#: audio fingerprint: 32 energy frames → 31 comparison bits.
AFP_FRAMES = 32
AFP_BITS = AFP_FRAMES - 1


def audio_fingerprint_bits(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-energy audio fingerprint — the audio member of the
    perceptual-dedup family (Haitsma & Kalker 2002's energy-difference
    hash reduced to the time axis so every quantity is an EXACT
    integer; no FFT, no floats anywhere): decode PCM16 → split into 32
    frames by the floor mapping (frame f covers samples
    [f·n//32, (f+1)·n//32)) → frame energy = Σ s² (exact BIGINT —
    PCM16 squares can't overflow) → bit f = energy(f+1) > energy(f),
    a 31-bit fingerprint. Robust to uniform gain DOWN-scaling and id
    re-encodes; localized edits flip only their frames' bits.

    The only Python is decode + the integer energy sums (the
    char-entropy r14 pattern: exact counting Python-side, the
    comparisons and bit packing in Catalyst); map-only, zero
    exchanges. Undecodable blobs are dropped (degrade-don't-raise).
    Output: (id, n_samples, afp)."""
    import pandas as pd

    from .multimodal import decode_wav_samples

    def run(batches):
        for pdf in batches:
            ids, ns, es = [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                s = decode_wav_samples(content)
                if s is None or len(s) < AFP_FRAMES:
                    continue
                n = len(s)
                ids.append(mid)
                ns.append(n)
                es.append(
                    [
                        sum(
                            v * v
                            for v in s[
                                f * n // AFP_FRAMES : (f + 1)
                                * n
                                // AFP_FRAMES
                            ]
                        )
                        for f in range(AFP_FRAMES)
                    ]
                )
            yield pd.DataFrame(
                {
                    id_col: pd.array(ids, dtype="Int64"),
                    "n_samples": pd.array(ns, dtype="Int32"),
                    # object dtype: an all-dropped batch must still
                    # convert to Arrow list<int64> (empty inference
                    # otherwise picks a dtype Arrow refuses)
                    "energies": pd.Series(es, dtype="object"),
                }
            )

    en = df.select(id_col, content_col).mapInPandas(
        run, f"{id_col} long, n_samples int, energies array<long>"
    )
    e = F.col("energies")

    def bit_term(acc, f):
        return acc + F.when(
            F.element_at(e, (f + F.lit(2)).cast("int"))
            > F.element_at(e, (f + F.lit(1)).cast("int")),
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"), f.cast("int")
            ),
        ).otherwise(F.lit(0).cast("bigint"))

    # ONE aggregate over the bit indices instead of 31 inlined when-
    # terms (the dhash_bits r14 lesson: inlined terms cost seconds of
    # codegen per distinct plan)
    fp = F.aggregate(
        F.sequence(F.lit(0), F.lit(AFP_BITS - 1)),
        F.lit(0).cast("bigint"),
        bit_term,
    )
    return en.select(id_col, "n_samples", fp.alias("afp"))
