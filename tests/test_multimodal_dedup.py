"""Perceptual image dedup (r14): the 63-bit dHash operator, the noise
PNG fixture generator, and the shared Hamming banding."""

from __future__ import annotations

from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.multimodal import (
    decode_png_pixels,
    synth_noise_png_bytes,
)
from churn_model_evaluation_platform_spark.operators.multimodal_dedup import (
    DHASH_BITS,
    DHASH_H,
    DHASH_W,
    dhash_bits,
)

W, H = DHASH_W, DHASH_H


def _py_dhash(m: int, corrupt: bool = False) -> int:
    """Independent scalar replay of generator → resize → dHash."""
    w, h = 4 + m % 13, 4 + m % 11

    def gray(yy, xx):
        iny, inx = (yy * h) // H, (xx * w) // W
        g = 0
        for c in range(3):
            v = (
                ((m + 1000 * iny + 3 * inx + c) * 2654435761)
                % 4294967296
            ) >> 24
            if corrupt and iny == 0 and inx == 0:
                v ^= 128
            g += v
        return g

    fp = 0
    for y in range(H):
        for x in range(W - 1):
            if gray(y, x + 1) > gray(y, x):
                fp |= 1 << (y * (W - 1) + x)
    return fp


def _media(spark, rows):
    import pandas as pd

    df = spark.createDataFrame(rows, "media_id long, spec long")

    def synth(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": [
                        synth_noise_png_bytes(
                            int(s) % 1_000_000,
                            corrupt=int(s) >= 1_000_000,
                        )
                        for s in pdf["spec"]
                    ],
                }
            )

    return df.mapInPandas(synth, "media_id long, content binary")


def test_noise_png_round_trips_generator_formula():
    for m in (0, 7, 123):
        w, h, rgb = decode_png_pixels(synth_noise_png_bytes(m))
        assert (w, h) == (4 + m % 13, 4 + m % 11)
        want = [
            (((m + 1000 * y + 3 * x + c) * 2654435761) % 4294967296)
            >> 24
            for y in range(h)
            for x in range(w)
            for c in range(3)
        ]
        assert list(rgb) == want


def test_dhash_matches_scalar_replay(spark):
    ids = [0, 4, 8, 44, 120]
    out = {
        r["media_id"]: r["dhash"]
        for r in dhash_bits(_media(spark, [(m, m) for m in ids])).collect()
    }
    assert out == {m: _py_dhash(m) for m in ids}
    # 63 bits: the fingerprint can never go negative on either engine
    assert all(0 <= v < (1 << DHASH_BITS) for v in out.values())


def test_dhash_invariant_to_reencode_and_near_for_perturbed(spark):
    # same pixels under a new media_id -> identical fingerprint;
    # pixel-(0,0)-corrupted twin -> within the banding guarantee
    from churn_model_evaluation_platform_spark.operators.dedup import (
        fingerprint_hamming_pairs,
    )

    rows = [(1, 40), (2, 40), (3, 40 + 1_000_000)]  # base, copy, corrupt
    fps = dhash_bits(_media(spark, rows))
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in fingerprint_hamming_pairs(
            fps, "dhash", "media_id", bits=DHASH_BITS,
            max_hamming=6, chunks=7,
        ).collect()
    }
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 3)] <= 2 and pairs[(2, 3)] <= 2


def test_undecodable_blob_dropped_not_failed(spark):
    import pandas as pd

    df = spark.createDataFrame([(1,), (2,)], "media_id long")

    def synth(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": [
                        synth_noise_png_bytes(5)
                        if int(m) == 1
                        else b"not a png at all"
                        for m in pdf["media_id"]
                    ],
                }
            )

    media = df.mapInPandas(synth, "media_id long, content binary")
    out = dhash_bits(media).collect()
    assert [r["media_id"] for r in out] == [1]


def test_banding_pigeonhole_guarantee(spark):
    # every pair within hamming <= chunks-1 MUST surface: plant
    # fingerprints at controlled distances around the chunk layout
    from churn_model_evaluation_platform_spark.operators.dedup import (
        fingerprint_hamming_pairs,
    )

    base = _py_dhash(8)
    flips = [0, 1, 9, 18, 27, 36, 45, 54]  # one bit in many chunks
    fp2 = base
    for b in flips[1:7]:
        fp2 ^= 1 << b  # hamming 6 spread over 6 different chunks
    rows = [(1, base), (2, fp2)]
    fps = spark.createDataFrame(rows, "media_id long, dhash long")
    got = fingerprint_hamming_pairs(
        fps, "dhash", "media_id", bits=DHASH_BITS, max_hamming=6, chunks=7
    ).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in got] == [
        (1, 2, 6)
    ]


def test_hamming_join_counts_strictly_earlier(spark):
    from churn_model_evaluation_platform_spark.operators.dedup import (
        fingerprint_hamming_join,
    )

    base = _py_dhash(8)
    rows = [(10, base), (20, base), (30, base ^ 1), (40, base ^ (1 << 40))]
    fps = spark.createDataFrame(rows, "arrival long, dhash long")
    got = {
        r["arrival"]: (r["n_earlier"], r["min_hamming"])
        for r in fingerprint_hamming_join(
            fps, fps, "dhash", "arrival",
            bits=DHASH_BITS, max_hamming=6, chunks=7,
        ).collect()
    }
    # 10 has nothing earlier -> absent; 20 matches 10 (ham 0);
    # 30 matches 10 and 20 (ham 1); 40 matches all three (ham 1 or 2)
    assert 10 not in got
    assert got[20] == (1, 0)
    assert got[30] == (2, 1)
    assert got[40] == (3, 1)


def test_stream_image_gate_equals_batch_bruteforce(spark):
    # drained verdicts == "no earlier image within T" brute force
    from churn_model_evaluation_platform_spark.operators.dedup import (
        fingerprint_hamming_join,
    )

    specs = [(m, m) for m in (0, 4, 8, 20, 24)] + [
        (1_000_020, 20),          # exact re-encode of 20
        (2_000_024, 24 + 1_000_000),  # perturbed twin of 24
    ]
    fps = {
        r["media_id"]: r["dhash"]
        for r in dhash_bits(_media(spark, specs)).collect()
    }
    # arrival = (media_id % 3, media_id)
    order = sorted(fps, key=lambda m: (m % 3, m))

    def ham(a, b):
        return bin(a ^ b).count("1")

    want = {}
    for i, m in enumerate(order):
        n = sum(1 for e in order[:i] if ham(fps[m], fps[e]) <= 6)
        want[m] = (n, n == 0)
    arr_rows = [
        ((m % 3) * 10_000_000 + m, fps[m], m) for m in fps
    ]
    arr = spark.createDataFrame(
        arr_rows, "arrival long, dhash long, media_id long"
    )
    earlier = fingerprint_hamming_join(
        arr, arr, "dhash", "arrival",
        bits=DHASH_BITS, max_hamming=6, chunks=7,
    )
    got = {
        r["media_id"]: (r["n"], r["n"] == 0)
        for r in arr.join(earlier, "arrival", "left")
        .select(
            "media_id",
            F.coalesce("n_earlier", F.lit(0)).alias("n"),
        )
        .collect()
    }
    assert got == want
    # the planted twins were rejected by the cross-batch gate
    assert want[1_000_020][1] is False or want[20][1] is False


# ---------------------------------------------------------------------------
# audio fingerprint (r14)
# ---------------------------------------------------------------------------


def _py_afp(m: int, corrupt: bool = False) -> int:
    from churn_model_evaluation_platform_spark.operators.multimodal import (
        decode_wav_samples,
        synth_noise_wav_bytes,
    )

    s = decode_wav_samples(synth_noise_wav_bytes(m, corrupt))
    n = len(s)
    E = [
        sum(v * v for v in s[f * n // 32 : (f + 1) * n // 32])
        for f in range(32)
    ]
    return sum(1 << f for f in range(31) if E[f + 1] > E[f])


def _audio(spark, rows):
    import pandas as pd

    from churn_model_evaluation_platform_spark.operators.multimodal import (
        synth_noise_wav_bytes,
    )

    df = spark.createDataFrame(rows, "media_id long, spec long")

    def synth(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": [
                        synth_noise_wav_bytes(
                            int(s) % 1_000_000,
                            corrupt=int(s) >= 1_000_000,
                        )
                        for s in pdf["spec"]
                    ],
                }
            )

    return df.mapInPandas(synth, "media_id long, content binary")


def test_audio_fingerprint_matches_scalar_replay(spark):
    from churn_model_evaluation_platform_spark.operators.multimodal_dedup import (
        AFP_BITS,
        audio_fingerprint_bits,
    )

    ids = [2, 6, 22, 42]
    out = {
        r["media_id"]: r["afp"]
        for r in audio_fingerprint_bits(
            _audio(spark, [(m, m) for m in ids])
        ).collect()
    }
    assert out == {m: _py_afp(m) for m in ids}
    assert all(0 <= v < (1 << AFP_BITS) for v in out.values())


def test_audio_twins_and_undecodable(spark):
    import pandas as pd

    from churn_model_evaluation_platform_spark.operators.dedup import (
        fingerprint_hamming_pairs,
    )
    from churn_model_evaluation_platform_spark.operators.multimodal_dedup import (
        AFP_BITS,
        audio_fingerprint_bits,
    )

    rows = [(1, 42), (2, 42), (3, 42 + 1_000_000)]
    fps = audio_fingerprint_bits(_audio(spark, rows))
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in fingerprint_hamming_pairs(
            fps, "afp", "media_id", bits=AFP_BITS,
            max_hamming=3, chunks=4,
        ).collect()
    }
    assert pairs[(1, 2)] == 0        # byte-identical re-encode
    assert pairs[(1, 3)] <= 1        # first-frame-silenced twin
    # undecodable blob dropped, not failed
    df = spark.createDataFrame([(9,)], "media_id long")

    def bad(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "content": [b"nope"]}
            )

    media = df.mapInPandas(bad, "media_id long, content binary")
    assert audio_fingerprint_bits(media).collect() == []
