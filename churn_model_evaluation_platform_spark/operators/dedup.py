"""Deduplication operators for training-data pipelines (north-star
extensions; SURVEY §7.2 item 7): exact, n-gram Jaccard, MinHash+LSH,
SimHash.

Scale design:
- Exact dedup is a hash-groupBy — one shuffle on a 128-bit digest, never
  on the document body (at 100 TB you shuffle 16-byte keys, not text).
- N-gram Jaccard generates candidates by shingle join — quadratic in
  bucket size, so it is the VERIFY step; candidate generation at scale is
  MinHash+LSH (band-bucket join ⇒ near-linear).
- All hashes are the portable md5-derived ints (functions/hashing.py) so
  the DuckDB oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash_int, minhash_perms, perm_expr
from .text import normalize_text, shingle_hashes

DEFAULT_MINHASH_K = 16
DEFAULT_BANDS = 4  # 4 bands x 4 rows


# (applicationId, semanticHash) → whether the lineage needs a repartition.
# Bounded: cleared wholesale if it ever grows past _PARALLELISM_MEMO_MAX.
_PARALLELISM_MEMO: dict[tuple[str, int], bool] = {}
_PARALLELISM_MEMO_MAX = 1024


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread CPU-heavy per-row work across all cores.

    A small parquet file is one row group = one partition, which would
    serialize the md5/shingle work on a single task. The repartition
    shuffle moves only the raw rows (cheap) and buys full parallelism for
    the expensive projection above it. At scale the source already has
    >= cores partitions and this is a no-op.

    The partition-count probe (``df.rdd.getNumPartitions()`` — forces
    physical planning driver-side) runs at most ONCE per DataFrame
    lineage: decisions are memoized by ``semanticHash`` (analysis-only,
    no physical planning), so repeated operator calls over the same
    source pay nothing. Config ``spark.churnspark.ensureParallelism``
    overrides: ``never`` (100 TB posture — sources already carry >=
    cores splits, skip even the first probe), ``always``, or ``auto``
    (default, memoized probe).

    The memo key is ``(applicationId, semanticHash, n_input_files)``:
    the input-file count (``df.inputFiles()`` — served from the already
    -built file index, no data scan) folds physical source state into
    the key, so a path-based source that gains files mid-application
    (e.g. a drop directory re-read across batches) gets a fresh probe
    instead of the first verdict forever. Note ``inputFiles()``
    materializes the full path list driver-side — O(n_files), fine for
    the small-source case this helper exists for; the 100 TB posture is
    ``never`` mode, which returns before BOTH the file listing and the
    partition probe. Remaining caveat: a source
    whose file COUNT is stable but whose row-group count changed still
    reuses the old verdict, and a 32-bit semanticHash collision could
    skip a needed repartition — accepted trade-offs; set ``always``/
    ``never`` to bypass the memo entirely.
    """
    spark = df.sparkSession
    p = spark.sparkContext.defaultParallelism
    mode = spark.conf.get("spark.churnspark.ensureParallelism", "auto")
    if mode == "never":
        return df
    if mode == "always":
        return df.repartition(p)
    try:
        nfiles = len(df.inputFiles())
    except Exception:  # non-file-backed plans (streams, local relations)
        nfiles = -1
    key = (spark.sparkContext.applicationId, df.semanticHash(), nfiles)
    needs = _PARALLELISM_MEMO.get(key)
    if needs is None:
        needs = df.rdd.getNumPartitions() < p
        if len(_PARALLELISM_MEMO) >= _PARALLELISM_MEMO_MAX:
            _PARALLELISM_MEMO.clear()
        _PARALLELISM_MEMO[key] = needs
    return df.repartition(p) if needs else df


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on normalized content: one row per distinct content,
    keeping the smallest id (deterministic winner) + copy count."""
    h = F.md5(normalize_text(F.col(text_col)))
    return (
        df.select(F.col(id_col), h.alias("content_md5"))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(id_col, "content_md5", "n_copies")
    )


def _doc_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, shingle_hash) exploded, distinct per doc."""
    return ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.explode(shingle_hashes(F.col(text_col), n)).alias("sh"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard ≥ threshold.

    candidates = shingle self-join (docs sharing ≥1 shingle);
    jaccard = |A∩B| / (|A| + |B| - |A∩B|) from exact distinct-shingle
    counts. Output: (id_a, id_b, jaccard) with id_a < id_b.

    At scale: the shingle join is the exact verifier — run it only on
    LSH candidates (``lsh_verified_pairs`` is that composition) when
    the corpus is large; standalone, the shingle self-join is quadratic
    in shingle-bucket size.
    """
    # No cache: the sizes/self-join branches are identical subplans and
    # share one shuffle exchange (ReusedExchange) — materializing the
    # exploded shingle frame would be data-proportional (SCALE.md).
    sh = _doc_shingles(df, text_col, id_col, n)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("common")).cast("double")
            ).alias("jaccard"),
        )
    )
    return jac.where(F.col("jaccard") >= F.lit(threshold))


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    n: int = 3,
    min_common: int = 5,
) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing ≥ ``min_common``
    distinct n-gram shingles with a benchmark/eval doc (the GPT-3
    appendix-C / Llama n-gram-collision check a training pipeline runs
    before every release; 13-grams there, parameterized here).

    Output ``(doc_id, bench_id, common, containment)`` — containment =
    |shingles(doc) ∩ shingles(bench)| / |shingles(doc)|, the standard
    decontamination score (directional: how much of the TRAINING doc is
    benchmark material).

    Scale: the benchmark side is eval-set-sized by construction, so its
    shingle table is broadcast — the corpus side streams map-side
    through the hash join with zero shuffle of corpus text; only
    (doc_id, bench_id) partial counts shuffle for the final aggregate.
    The per-doc shingle count rides THROUGH the explode as a constant
    column (``size`` of the already-distinct shingle array is a pure
    map-side projection), so there is no separate sizes branch, no
    second pass over the corpus, and no rejoin — the candidate
    aggregate is the plan's only shuffle.
    """
    # explode_OUTER, deliberately: a plain explode of a projected
    # attribute lets InferFiltersFromGenerate add `size(__shs) > 0`,
    # which pushdown rewrites to the full md5-fold expression below the
    # repartition exchange — the whole shingle pipeline then runs a
    # second time at raw-source parallelism (measured 10x slower on a
    # single-file parquet input). Outer explode admits empty arrays so
    # no filter can be inferred; the inner join on `sh` drops the null
    # rows anyway. n_sh is projected before the explode so Generate
    # retains only the scalar, not the array.
    c_sh = (
        ensure_parallelism(corpus)
        .select(
            F.col(id_col).alias(id_col),
            shingle_hashes(F.col(text_col), n).alias("__shs"),
        )
        .select(id_col, F.size("__shs").alias("n_sh"), "__shs")
        .select(id_col, "n_sh", F.explode_outer("__shs").alias("sh"))
    )
    b_sh = _doc_shingles(benchmark, text_col, bench_id_col, n).select(
        F.col("id").alias(bench_id_col), "sh"
    )
    return (
        c_sh.join(F.broadcast(b_sh), "sh")
        .groupBy(id_col, "n_sh", bench_id_col)
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= min_common)
        .select(
            id_col,
            bench_id_col,
            "common",
            F.round(
                F.col("common").cast("double") / F.col("n_sh").cast("double"),
                6,
            ).alias("containment"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = DEFAULT_MINHASH_K,
    seed: int = 42,
) -> DataFrame:
    """MinHash signature per doc: k columns ``m0..m{k-1}``, each the min of
    a seeded universal hash over the doc's shingle hashes.

    ZERO shuffle: the per-doc min is a higher-order ``array_min(transform)``
    over the shingle-hash array — a pure map-side projection (the earlier
    explode+groupBy shape multiplied rows by shingle count and shuffled
    them back just to take a min). The array column is bound once per row
    (``withColumn``) so the k mins don't recompute the hashes."""
    perms = minhash_perms(k, seed)
    with_sh = (
        ensure_parallelism(df)
        .where(F.col(text_col).isNotNull())
        .withColumn("__sh", shingle_hashes(F.col(text_col), n))
    )
    def _perm_min(a: int, b: int):
        # factory: PySpark derives lambda arity from the signature, so the
        # callback must take exactly one arg (no default-arg closures)
        return F.array_min(
            F.transform(F.col("__sh"), lambda h: perm_expr(h, a, b))
        )

    sig_cols = [
        _perm_min(a, b).alias(f"m{i}") for i, (a, b) in enumerate(perms)
    ]
    return with_sh.select(F.col(id_col), *sig_cols)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    seed: int = 42,
) -> DataFrame:
    """LSH candidate pairs: band the k-min signature into ``bands`` groups
    of k/bands rows; docs colliding on ANY full band are candidates.

    Output: (id_a, id_b, est_jaccard) — est_jaccard = fraction of equal
    signature components (unbiased Jaccard estimate). The scale path: the
    only join is on (band_index, band_key) buckets, near-linear for
    non-degenerate corpora; verify candidates with ``ngram_jaccard_pairs``
    semantics afterwards.
    """
    # No cache: the a/b sides of the self-join are identical subplans,
    # so the physical plan reuses one shuffle exchange (ReusedExchange)
    # — materializing 100 TB of signatures would be the real cost.
    sigs = minhash_signatures(df, text_col, id_col, n, k, seed)
    return _banded_pairs(sigs, id_col, k, bands)


def _banded_pairs(
    sigs: DataFrame, id_col: str, k: int, bands: int
) -> DataFrame:
    """Band a (id, m0..m{k-1}) signature frame and self-join on
    (band, band_key) buckets → (id_a, id_b, est_jaccard)."""
    r = k // bands
    sig_cols = [f"m{i}" for i in range(k)]
    band_rows = []
    for bi in range(bands):
        key = F.concat_ws("|", *[F.col(c) for c in sig_cols[bi * r : (bi + 1) * r]])
        band_rows.append(
            F.struct(F.lit(bi).alias("band"), key.alias("band_key"))
        )
    banded = sigs.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in sig_cols],
        F.explode(F.array(*band_rows)).alias("b"),
    ).select("id", *sig_cols, "b.band", "b.band_key")
    a = banded.alias("a")
    b = banded.alias("b")
    eq_sum = sum(
        (F.col(f"a.{c}") == F.col(f"b.{c}")).cast("int") for c in sig_cols
    )
    # est_jaccard is computed BEFORE the distinct so the dedup shuffle
    # carries (id_a, id_b, est) — 3 columns, not 2 + k equality flags.
    # A pair colliding in several bands yields identical rows, so the
    # distinct is exact.
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (eq_sum / F.lit(float(k))).alias("est_jaccard"),
        )
        .distinct()
    )


def lsh_verified_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """The scale-path dedup composition: banded-LSH candidate pairs →
    EXACT n-gram-Jaccard verification on candidates only.

    Replaces the standalone shingle self-join (quadratic in
    shingle-bucket size) with: (1) ``minhash_lsh_pairs`` — the only
    wide join is on (band, band_key) buckets, near-linear; (2) an exact
    verify that joins the candidate ids back to each doc's distinct
    shingle-hash ARRAY and computes Jaccard with
    ``array_intersect``/``size`` — pure JVM expressions, no shingle
    explode, no self-join.  The candidate side is tiny relative to the
    corpus, so AQE turns the id joins into broadcasts when it fits.

    Output: (id_a, id_b, jaccard) with jaccard ≥ threshold — identical
    semantics to ``ngram_jaccard_pairs`` restricted to LSH candidates.

    The shingle-hash projection (the expensive md5 fold over every doc)
    is computed ONCE into a shared (id, shs) frame: the minhash
    signatures derive from the distinct-shingle array (min over a
    distinct set equals min over the multiset), and the verify joins
    reuse the same subplan — the two id-hashed exchanges share one
    ReusedExchange rather than re-deriving shingles per branch.
    """
    arr = (
        ensure_parallelism(df)
        .where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(shingle_hashes(F.col(text_col), n)).alias("shs"),
        )
    )
    perms = minhash_perms(k, seed)

    def _perm_min(a: int, b: int):
        return F.array_min(F.transform(F.col("shs"), lambda h: perm_expr(h, a, b)))

    sigs = arr.select(
        "id", *[_perm_min(a, b).alias(f"m{i}") for i, (a, b) in enumerate(perms)]
    )
    cand = _banded_pairs(sigs, "id", k, bands).select("id_a", "id_b")
    pairs = cand.join(
        arr.select(F.col("id").alias("id_a"), F.col("shs").alias("sh_a")), "id_a"
    ).join(
        arr.select(F.col("id").alias("id_b"), F.col("shs").alias("sh_b")), "id_b"
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (
        F.size("sh_a") + F.size("sh_b") - inter
    ).cast("double")
    return pairs.select("id_a", "id_b", jac.alias("jaccard")).where(
        F.col("jaccard") >= F.lit(threshold)
    )


def _recall_summary(exact: DataFrame, cand: DataFrame) -> DataFrame:
    """Shared (n_true_pairs, n_recalled, recall) summary for the recall
    audits. With ZERO true pairs recall is vacuously 1.0 — 0/0 would be
    NULL under Spark but nan in the DuckDB oracles (the cross-engine
    zero-division class), and "nothing to find, nothing missed" is the
    honest reading. ``cand`` must carry (id_a, id_b, __hit)."""
    return (
        exact.join(cand, ["id_a", "id_b"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_true_pairs"),
            F.count("__hit").alias("n_recalled"),
        )
        .select(
            "n_true_pairs",
            "n_recalled",
            F.when(F.col("n_true_pairs") == 0, F.lit(1.0))
            .otherwise(
                F.round(
                    F.col("n_recalled").cast("double")
                    / F.col("n_true_pairs").cast("double"),
                    6,
                )
            )
            .alias("recall"),
        )
    )


def lsh_candidate_recall(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Measured quality of the approximate dedup path: what fraction of
    the TRUE near-dup pairs (exact n-gram Jaccard ≥ threshold) does the
    banded-LSH candidate generator recover?

    One summary row ``(n_true_pairs, n_recalled, recall)``. The exact
    side is ``ngram_jaccard_pairs`` (shingle self-join — the ground
    truth LSH exists to avoid), so this is a QA/audit operator: run it
    on a sample or a small SF to certify a (k, bands) configuration,
    not on the full 100 TB corpus. Candidate pairs are distinct by
    construction (``minhash_lsh_pairs`` dedups band collisions), so the
    left join keeps exactly one row per true pair.
    """
    exact = ngram_jaccard_pairs(df, text_col, id_col, n=n, threshold=threshold)
    cand = (
        minhash_lsh_pairs(df, text_col, id_col, n=n, k=k, bands=bands, seed=seed)
        .select("id_a", "id_b")
        .withColumn("__hit", F.lit(1))
    )
    return _recall_summary(exact, cand)


def containment_candidate_recall(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k_rare: int = 5,
    min_blocks: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Measured recall of the rare-shingle containment blocking against
    exact shingle-join ground truth — completes the recall-audit family
    (``lsh_candidate_recall``, ``simhash_candidate_recall``).

    One summary row ``(n_true_pairs, n_recalled, recall)``. Expected
    1.0 for FULL-containment pairs: every one of A's k_rare rarest
    shingles is in B, and tiny docs degrade the block threshold to
    their own shingle count — a sub-1.0 reading on a full-containment
    corpus flags a blocking bug. PARTIAL-overlap pairs (threshold <=
    c < 1) can legitimately miss with probability ~(1-c)^k_rare (see
    ``containment_pairs``), so on mixed corpora a sub-1.0 reading can
    be a tuning artifact of (k_rare, min_blocks), not a bug.
    The exact side is the all-common-shingle equi-join (bounded by
    Σ df² per shingle, the join rare-blocking exists to shrink): QA
    scale — run on a sample to certify a (k_rare, min_blocks) config.
    """
    arr = (
        ensure_parallelism(df)
        .where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(shingle_hashes(F.col(text_col), n)).alias("shs"),
        )
    )
    sh = arr.select("id", F.explode("shs").alias("h"))
    sizes = arr.select("id", F.size("shs").alias("nsh"))
    common = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    exact = (
        common.join(
            sizes.select(F.col("id").alias("id_a"), F.col("nsh").alias("na")),
            "id_a",
        )
        .join(
            sizes.select(F.col("id").alias("id_b"), F.col("nsh").alias("nb")),
            "id_b",
        )
        .where(
            F.col("common").cast("double")
            / F.least("na", "nb").cast("double")
            >= F.lit(threshold)
        )
        .select("id_a", "id_b")
    )
    cand = (
        containment_pairs(df, text_col, id_col, n, k_rare, min_blocks, threshold)
        .select("id_a", "id_b")
        .withColumn("__hit", F.lit(1))
    )
    return _recall_summary(exact, cand)


def simhash_candidate_recall(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Measured recall of the pigeonhole SimHash candidate generator
    against brute-force Hamming ground truth — the simhash twin of
    ``lsh_candidate_recall``.

    One summary row ``(n_true_pairs, n_recalled, recall)``. Unlike
    banded MinHash-LSH (probabilistic recall), the chunk trick is
    provably complete for ``max_hamming < chunks`` — any pair within
    distance 3 must agree on one of 4 chunks — so the certified number
    is exactly 1.0; a lower value would indicate a chunking bug, not a
    tuning trade-off. The exact side is the all-pairs XOR the blocking
    exists to avoid (an (id, int64) self-join, NOT a text join): QA
    scale only — run on a sample to certify a (bits, chunks) config.
    """
    sh = simhash(df, text_col, id_col, bits)
    a, b = sh.alias("a"), sh.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    exact = (
        a.join(b, F.col("a." + id_col) < F.col("b." + id_col))
        .where(ham <= max_hamming)
        .select(
            F.col("a." + id_col).alias("id_a"),
            F.col("b." + id_col).alias("id_b"),
        )
    )
    cand = (
        simhash_pairs(df, text_col, id_col, bits, max_hamming, chunks)
        .select("id_a", "id_b")
        .withColumn("__hit", F.lit(1))
    )
    return _recall_summary(exact, cand)


def edit_distance_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_edit: int = 20,
    bits: int = 32,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Typo-class near-dup pairs: SimHash pigeonhole candidates verified
    by Levenshtein distance on the normalized text.

    Edit distance is O(len²) per pair — never run it all-pairs. The
    pigeonhole chunk join bounds the verifier to pairs already within
    ``max_hamming`` SimHash bits (complete for hamming < chunks), so the
    expensive DP touches only genuine candidates. Output:
    (id_a, id_b, hamming, edit_distance) with edit_distance ≤ max_edit.
    """
    cand = simhash_pairs(df, text_col, id_col, bits, max_hamming, chunks)
    norm = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), normalize_text(F.col(text_col)).alias("norm")
    )
    joined = cand.join(
        norm.select(F.col("id").alias("id_a"), F.col("norm").alias("na")), "id_a"
    ).join(
        norm.select(F.col("id").alias("id_b"), F.col("norm").alias("nb")), "id_b"
    )
    return (
        joined.withColumn("edit_distance", F.levenshtein("na", "nb"))
        .where(F.col("edit_distance") <= max_edit)
        .select("id_a", "id_b", "hamming", "edit_distance")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-LSH candidate join +
    exact cosine verification (north-star dedup family, embedding flavor).

    Returns ``(id_a, id_b, cosine_sim)`` for pairs whose exact cosine is
    >= ``threshold`` among pairs colliding in the LSH bucket.

    Scale: candidates come from a self-equi-join on the bucket id — a
    hash-shuffle on a small int key, never an all-pairs product; only
    colliding pairs pay the O(dim) cosine. Recall/cost is tuned with
    ``n_planes`` (each plane halves the expected bucket size); at 100 TB
    write the table bucketed by ``lsh_bucket`` so the self-join is
    co-located and shuffle-free. Skewed buckets are split by AQE skew-join.
    """
    from .similarity import cosine_expr, lsh_bucket_expr, random_hyperplanes

    if dim is None:
        # Fallback ONLY: one single-row driver action. Callers that know
        # the embedding width (any production table) should pass ``dim``
        # — the registry query does.
        dim = len(df.select(vec_col).first()[0])
    planes = random_hyperplanes(dim, n_planes, seed)
    # per-row norm computed once before the bucket self-join — the
    # verification cosine then folds only the dot per pair; division /
    # multiply order matches cosine_expr so every similarity is
    # bit-identical (optimization r16, guide §2.3 — the
    # semantic_dedup_clustered rationale)
    from .similarity import _dot, _norm

    b = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_bucket_expr(F.col(vec_col), planes).alias("bk"),
        _norm(F.col(vec_col)).alias("nv"),
    )
    pairs = b.alias("a").join(
        b.alias("b"),
        (F.col("a.bk") == F.col("b.bk")) & (F.col("a.id") < F.col("b.id")),
    )
    return pairs.select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        (
            _dot(F.col("a.v"), F.col("b.v"))
            / (F.col("a.nv") * F.col("b.nv"))
        ).alias("cosine_sim"),
    ).where(F.col("cosine_sim") >= F.lit(threshold))


def semantic_dedup_clustered(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style clustered semantic dedup (Abbas et al. 2023,
    arXiv:2303.09540): bucket the corpus by nearest centroid, then
    within each cluster mark as duplicates the points whose max cosine
    similarity to any EARLIER-RANKED cluster member reaches
    ``threshold`` — the published implementation's upper-triangular
    sim-matrix filter, with rank = distance-to-centroid DESCENDING
    (the kept representative of a near-dup group is the one farthest
    from the centroid, the paper's low-centroid-similarity choice; ties
    break on id). Unlike the greedy sequential variant this is fully
    parallel and deterministic: whether a point survives depends only
    on earlier-ranked points, kept or not.

    Returns one row per input: ``(id_col, cluster_id, keep,
    max_sim_prior)`` — ``max_sim_prior`` is NULL for each cluster's
    rank-1 point.

    Scale: the pairwise work is Σ|cluster|² — the centroid count
    controls the quadratic term (SemDeDup's whole point: n²/C instead
    of n²), and the only wide exchanges are the two hash-shuffles on
    ``cluster_id`` (the window rank and the self-join; one co-location
    serves both). Assignment is ``ivf_cell_expr`` — pure codegen, no
    UDF — sharing the IVF family's exact dot-identity arithmetic so
    the DuckDB oracle replays assignment bit-for-bit. Skewed clusters
    (one mega-cluster) are AQE skew-join territory; at 100 TB the
    centroid fit itself is a sampled MLlib job and C scales with n to
    hold Σ|cluster|² near-linear."""
    from .similarity import _dot, _pydot, cosine_expr, ivf_cell_expr

    base = ensure_parallelism(
        df.where(F.col(vec_col).isNotNull())
    ).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        ivf_cell_expr(F.col(vec_col), centroids).alias("cluster_id"),
    )
    # distance² to the OWN centroid, by array lookup on the broadcast
    # centroid literals — same dot-identity form as the assignment
    # nested-literal arrays in ONE py4j call each (optimization r16):
    # the unrolled F.array(*[F.lit(x) ...]) form paid C×d literal
    # round-trips of plan-construction driver time per run — see
    # similarity._centroid_dists; values and schema are identical
    cvecs = F.lit([[float(x) for x in c] for c in centroids])
    dcc = F.lit([_pydot(c, c) for c in centroids])
    own = F.element_at(cvecs, F.col("cluster_id") + 1)
    d2 = (
        _dot(F.col("v"), F.col("v"))
        - F.lit(2.0) * _dot(F.col("v"), own)
        + F.element_at(dcc, F.col("cluster_id") + 1)
    )
    ranked = base.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("cluster_id").orderBy(
                d2.desc(), F.col("id").asc()
            )
        ),
    )
    # Per-row norm computed ONCE before the pair join (optimization
    # r16, guide §2.3): cosine_expr inside the Σ|cluster|² join
    # re-folded BOTH norms per pair — 2 of its 3 array folds were
    # row-constant (measured ~2× on the pair stage). The pair now
    # evaluates one dot fold and reuses the norms; the division and
    # multiply order is cosine_expr's exactly (dot / (norm_a * norm_b))
    # so every similarity is bit-identical.
    from .similarity import _norm

    nranked = ranked.withColumn("nv", _norm(F.col("v")))
    earlier = nranked.select(
        "cluster_id",
        F.col("rnk").alias("rnk_a"),
        F.col("v").alias("va"),
        F.col("nv").alias("na"),
    )
    sims = (
        nranked.select("cluster_id", "id", "rnk", "v", "nv")
        .join(earlier, "cluster_id")
        .where(F.col("rnk_a") < F.col("rnk"))
        .groupBy("id")
        .agg(
            F.max(
                _dot(F.col("va"), F.col("v"))
                / (F.col("na") * F.col("nv"))
            ).alias("max_sim_prior")
        )
    )
    return ranked.join(sims, "id", "left").select(
        F.col("id").alias(id_col),
        "cluster_id",
        F.coalesce(
            F.col("max_sim_prior") < F.lit(threshold), F.lit(True)
        ).alias("keep"),
        "max_sim_prior",
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """SimHash fingerprint per doc from word hashes: bit j of the
    fingerprint is 1 iff sum over words of (±1 by word-hash bit j) > 0.

    ZERO shuffle: the per-bit sums are higher-order ``aggregate`` folds
    over the word-hash array — a pure map-side projection (the earlier
    explode+groupBy multiplied rows by word count and shuffled them back
    just to sum ±1s). 8 hex chars → 32-bit hashes; every intermediate
    stays in exact int64 for oracle parity.
    """
    with_h = (
        ensure_parallelism(df)
        .where(F.col(text_col).isNotNull())
        .withColumn(
            "__wh",
            F.transform(
                F.split(normalize_text(F.col(text_col)), " "),
                lambda w: md5_hash_int(w, 8),
            ),
        )
    )
    def _bit_sum(j: int):
        # factory, not default-arg closure: the merge lambda must declare
        # exactly (acc, elem) for PySpark's arity inference
        return F.aggregate(
            F.col("__wh"),
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(
                F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1)),
        )

    bit_sums = [_bit_sum(j).alias(f"s{j}") for j in range(bits)]
    agg = with_h.select(F.col(id_col).alias("id"), *bit_sums)
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return agg.select(F.col("id").alias(id_col), fp.cast("bigint").alias("simhash"))


def fingerprint_hamming_pairs(
    fp: DataFrame,
    fp_col: str,
    id_col: str,
    bits: int,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs among integer fingerprints by Hamming distance ≤
    ``max_hamming`` — the pigeonhole banding extracted from
    ``simhash_pairs`` (r14) so the image dHash family
    (``multimodal_dedup.dhash_bits``) shares one candidate generator:
    split the fingerprint into ``chunks`` chunks; any pair within
    distance < chunks must agree on ≥1 chunk → join per chunk bucket,
    then verify with ``bit_count``. Returns (id_a, id_b, hamming).

    Scale: the shuffle keys are (chunk, chunk-bits) buckets — pair
    work is bucket-bounded exactly like MinHash LSH, never corpus²."""
    # No cache — self-join sides share one exchange (see minhash_lsh_pairs).
    chunk_bits = bits // chunks
    mask = (1 << chunk_bits) - 1
    chunked = fp.select(
        F.col(id_col).alias("id"),
        F.col(fp_col).alias("__fp"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("chunk"),
                        F.shiftright(F.col(fp_col), ci * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("ckey"),
                    )
                    for ci in range(chunks)
                ]
            )
        ).alias("c"),
    ).select("id", "__fp", "c.chunk", "c.ckey")
    a = chunked.alias("a")
    b = chunked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ckey") == F.col("b.ckey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.__fp").alias("fp_a"),
            F.col("b.__fp").alias("fp_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


def fingerprint_hamming_join(
    probe: DataFrame,
    ref: DataFrame,
    fp_col: str,
    id_col: str,
    bits: int,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Banded Hamming join of a PROBE fingerprint frame against a
    REFERENCE frame — the incremental/streaming form of
    ``fingerprint_hamming_pairs``: for every probe row, count the
    reference rows with STRICTLY SMALLER id within ``max_hamming``.
    Returns (id, n_earlier, min_hamming) — probe rows with no earlier
    match are ABSENT (left-join the probe back for a keep flag).

    Scale: each side explodes only its own ``chunks`` chunk keys; the
    join is (chunk, chunk-bits)-bucket-bounded, so a micro-batch probe
    against a large accumulated reference never goes corpus² — the
    image-dedup analog of the line-dedup digest gate, with the
    pigeonhole guarantee (complete for hamming < chunks)."""
    chunk_bits = bits // chunks

    def _chunked(fp: DataFrame, side: str) -> DataFrame:
        mask = (1 << chunk_bits) - 1
        return fp.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(fp_col).alias(f"{side}_fp"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(ci).alias("chunk"),
                            F.shiftright(F.col(fp_col), ci * chunk_bits)
                            .bitwiseAND(F.lit(mask))
                            .alias("ckey"),
                        )
                        for ci in range(chunks)
                    ]
                )
            ).alias("c"),
        ).select(f"{side}_id", f"{side}_fp", "c.chunk", "c.ckey")

    p = _chunked(probe, "p")
    r = _chunked(ref, "r")
    cand = (
        p.join(
            r,
            (p["chunk"] == r["chunk"])
            & (p["ckey"] == r["ckey"])
            & (F.col("r_id") < F.col("p_id")),
        )
        .select("p_id", "p_fp", "r_id", "r_fp")
        .distinct()
    )
    ham = F.bit_count(F.col("p_fp").bitwiseXOR(F.col("r_fp")))
    return (
        cand.select("p_id", "r_id", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .groupBy(F.col("p_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_earlier"),
            F.min("hamming").cast("int").alias("min_hamming"),
        )
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming —
    ``fingerprint_hamming_pairs`` over the text SimHash."""
    sh = simhash(df, text_col, id_col, bits)
    return fingerprint_hamming_pairs(
        sh, "simhash", id_col, bits, max_hamming, chunks
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-doc novelty audit: the fraction of a document's distinct
    n-gram shingles that no earlier document (smaller id — ingestion
    order) has already contributed. Training-data curation uses this to
    rank late arrivals by marginal information and to spot crawl echoes
    that exact/near dedup miss (documents stitched from seen fragments).

    Output: (id_col, n_sh, n_novel, novelty).

    Scale: a shingle is novel for EXACTLY the doc that is its global
    min-id owner, so ``n_novel`` per doc is a count over the
    (shingle → first_id) aggregate itself — no join back onto the
    exploded shingle set. The distinct-shingle ARRAYS are materialized
    ONCE (``localCheckpoint``, the graph.py pattern — MEMORY_AND_DISK,
    spills at scale) and feed BOTH branches: ``n_sh`` is the array
    size, the explode consumes the same blocks — the r8 formulation's
    two branches each re-ran the regex+hash shingle pass over the raw
    text, and that duplicated map work, not the shuffle, was the r8
    4×-slope residual (measured 2.13 → 1.3 with the single
    materialization; VERDICT r8 #6). The only full-size shuffle
    remains the groupBy(shingle_hash) min (map-side combined, 8-byte
    hashes — never text); the novelty count partial-combines to
    ≤ n_docs rows per task, and the final join is doc-count ×
    doc-count.
    """
    arr = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("id"),
            shingle_hashes(F.col(text_col), n).alias("arr"),
        )
        .localCheckpoint(eager=False)
    )
    per_doc = arr.select("id", F.size("arr").alias("n_sh")).where(
        F.col("n_sh").isNotNull()
    )
    sh = arr.select("id", F.explode("arr").alias("sh"))
    novel = (
        sh.groupBy("sh")
        .agg(F.min("id").alias("first_id"))
        .groupBy("first_id")
        .agg(F.count(F.lit(1)).alias("n_novel"))
        .select(F.col("first_id").alias("id"), "n_novel")
    )
    return (
        per_doc.join(novel, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_sh",
            F.coalesce(F.col("n_novel"), F.lit(0).cast("bigint")).alias(
                "n_novel"
            ),
            F.round(
                F.coalesce(F.col("n_novel"), F.lit(0)).cast("double")
                / F.col("n_sh").cast("double"),
                6,
            ).alias("novelty"),
        )
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k_rare: int = 5,
    min_blocks: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Sub-document containment pairs via RARE-SHINGLE BLOCKING: score
    ``|A∩B| / min(|A|, |B|)`` (Broder's containment) — the asymmetric
    overlap that catches a document CONTAINED in a longer one, where
    Jaccard dilutes toward 0 as the size ratio grows.

    MinHash-banded LSH is the WRONG candidate generator here: bands
    collide with probability ~jaccard^r, and containment pairs have low
    Jaccard by definition (that is why they need a separate operator).
    Instead, candidates are docs sharing any of each doc's ``k_rare``
    globally rarest shingles (rare-token blocking, the entity-resolution
    standard): if A ⊆ B then every shingle of A — including its rarest —
    is in B, so full-containment recall is exactly 1.0; for partial
    overlap ≥ threshold the miss probability decays like
    (1-threshold)^k_rare. Bucket sizes are bounded by shingle document
    frequency — rare by construction — so the blocking join is
    near-linear, never the quadratic shingle self-join.

    Output: (id_a, id_b, containment, jaccard) with containment ≥
    threshold and id_a < id_b; jaccard rides along so consumers can
    split true near-dups (both high) from strict near-supersets
    (containment high, jaccard low).

    Scale: doc-frequency is a groupBy over 8-byte hashes; the per-doc
    k-rarest selection is a doc-partitioned window (key-distributed);
    the blocking join's skew is capped because a shingle with high df
    ranks out of everyone's rare set. Verification is array_intersect
    on candidate ids only, as in lsh_verified_pairs.
    """
    arr = (
        ensure_parallelism(df)
        .where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(shingle_hashes(F.col(text_col), n)).alias("shs"),
        )
    )
    # explode_OUTER: a plain explode would let InferFiltersFromGenerate
    # push a size(shs)>0 filter (and with it the whole md5 shingle fold)
    # below the repartition exchange — recomputing the fold at raw
    # source parallelism (same measured 10x trap as contamination_pairs;
    # see that docstring). Null rows never match the h-joins below.
    sh = arr.select("id", F.explode_outer("shs").alias("h"))
    freq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("id").orderBy("df", "h")
    rare = (
        sh.join(freq, "h")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k_rare)
        .select("id", "h")
    )
    # Candidate = pairs colliding on >= least(min_blocks, |A|, |B|)
    # DISTINCT rare shingles. For full containment every one of A's
    # k_rare rarest shingles is in B, so recall is exactly 1.0 at
    # min_blocks <= k_rare — including docs with FEWER than min_blocks
    # distinct shingles, whose threshold degrades to their own shingle
    # count (a one-shingle contained doc can only ever produce nb=1;
    # ADVICE r6). Requiring 2 instead of 1 for normal-size docs cuts the
    # verify set by the block-bucket tail (measured 87k -> far fewer
    # pairs on the synthetic corpus, whose tiny vocabulary makes even
    # "rare" shingles df~6).
    sizes = arr.select("id", F.size("shs").alias("nsh"))
    cand = (
        rare.alias("r")
        .join(
            sh.alias("s"),
            (F.col("s.h") == F.col("r.h")) & (F.col("s.id") != F.col("r.id")),
        )
        .select(
            F.least("r.id", "s.id").alias("id_a"),
            F.greatest("r.id", "s.id").alias("id_b"),
            F.col("r.h").alias("h"),
        )
        .distinct()
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("nb"))
        .join(sizes.select(F.col("id").alias("id_a"), F.col("nsh").alias("nsh_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("nsh").alias("nsh_b")), "id_b")
        .where(
            F.col("nb")
            >= F.least(F.lit(min_blocks), F.col("nsh_a"), F.col("nsh_b"))
        )
        .select("id_a", "id_b")
    )
    pairs = cand.join(
        arr.select(F.col("id").alias("id_a"), F.col("shs").alias("sh_a")), "id_a"
    ).join(
        arr.select(F.col("id").alias("id_b"), F.col("shs").alias("sh_b")), "id_b"
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    cont = inter.cast("double") / F.least(
        F.size("sh_a"), F.size("sh_b")
    ).cast("double")
    jac = inter.cast("double") / (
        F.size("sh_a") + F.size("sh_b") - inter
    ).cast("double")
    return pairs.select(
        "id_a", "id_b", cont.alias("containment"), jac.alias("jaccard")
    ).where(F.col("containment") >= F.lit(threshold))


def _band_rows(sigs: DataFrame, k: int, bands: int) -> DataFrame:
    """(id, band, band_key): one row per band of each signature."""
    r = k // bands
    sig_cols = [f"m{i}" for i in range(k)]
    band_structs = []
    for bi in range(bands):
        key = F.concat_ws(
            "|", *[F.col(c) for c in sig_cols[bi * r : (bi + 1) * r]]
        )
        band_structs.append(
            F.struct(F.lit(bi).alias("band"), key.alias("band_key"))
        )
    return sigs.select(
        "id", F.explode(F.array(*band_structs)).alias("b")
    ).select("id", "b.band", "b.band_key")


def incremental_dedup(
    corpus: DataFrame,
    incoming: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """Gate an INCOMING batch against an existing corpus — the shape
    ingestion dedup actually runs (every new crawl vs everything already
    kept), where a full-corpus self-join would redo quadratic work for
    data that never changed.

    Per incoming doc: ``exact_dup`` (normalized-content md5 already in
    the corpus) takes precedence over ``near_dup`` (any corpus doc
    colliding on a MinHash band AND verified n-gram Jaccard ≥
    threshold), else ``kept``. Output: (id_col, status).

    Scale: both probes are incoming-vs-corpus joins keyed on digests /
    (band, band_key) buckets — never text, never corpus×corpus. The
    corpus side needs only its digest + signature + shingle-array
    columns (a one-time index a real pipeline materializes and appends
    to, so successive batches pay corpus-scan cost once each).
    """
    inc_h = incoming.select(
        F.col(id_col).alias("id"),
        F.md5(normalize_text(F.col(text_col))).alias("content_md5"),
    )
    corp_h = corpus.select(
        F.md5(normalize_text(F.col(text_col))).alias("content_md5")
    ).distinct()
    exact_ids = inc_h.join(corp_h, "content_md5", "left_semi").select("id")

    def _arr(df: DataFrame) -> DataFrame:
        return (
            ensure_parallelism(df)
            .where(F.col(text_col).isNotNull())
            .select(
                F.col(id_col).alias("id"),
                F.array_distinct(
                    shingle_hashes(F.col(text_col), n)
                ).alias("shs"),
            )
        )

    perms = minhash_perms(k, seed)

    def _sigs(arr: DataFrame) -> DataFrame:
        def _perm_min(a: int, b: int):
            return F.array_min(
                F.transform(F.col("shs"), lambda h: perm_expr(h, a, b))
            )

        return arr.select(
            "id",
            *[_perm_min(a, b).alias(f"m{i}") for i, (a, b) in enumerate(perms)],
        )

    inc_arr, corp_arr = _arr(incoming), _arr(corpus)
    inc_bands = _band_rows(_sigs(inc_arr), k, bands)
    corp_bands = _band_rows(_sigs(corp_arr), k, bands).select(
        F.col("id").alias("cid"), "band", "band_key"
    )
    cand = (
        inc_bands.join(corp_bands, ["band", "band_key"])
        .select("id", "cid")
        .distinct()
    )
    pairs = cand.join(inc_arr.select("id", F.col("shs").alias("sh_i")), "id").join(
        corp_arr.select(F.col("id").alias("cid"), F.col("shs").alias("sh_c")),
        "cid",
    )
    inter = F.size(F.array_intersect("sh_i", "sh_c"))
    jac = inter.cast("double") / (
        F.size("sh_i") + F.size("sh_c") - inter
    ).cast("double")
    near_ids = (
        pairs.where(jac >= F.lit(threshold)).select("id").distinct()
    )
    return (
        incoming.select(F.col(id_col).alias("id"))
        .join(exact_ids.withColumn("__e", F.lit(1)), "id", "left")
        .join(near_ids.withColumn("__n", F.lit(1)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.when(F.col("__e") == 1, F.lit("exact_dup"))
            .when(F.col("__n") == 1, F.lit("near_dup"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
    )


def semantic_dedup_recall(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """QUALITY AUDIT of clustered semantic dedup against EXACT
    all-pairs ground truth (round 12, VERDICT r11 next #2) — the
    SemDeDup counterpart of ``lsh_candidate_recall``/``ivf_recall``: a
    QA operator certifying a fitted quantizer + threshold before the
    configuration is trusted at scale.

    Within a cluster the upper-triangular max-sim filter is EXACT, so
    clustering can only miss a duplicate pair by splitting it across
    clusters. Two numbers capture the damage:

    - ``pair_recall`` = co-clustered fraction of all exact-cosine
      >= threshold pairs (the candidate-recall analog);
    - ``keep_agreement`` = fraction of points whose keep/drop decision
      matches the EXACT run — ``semantic_dedup_clustered`` with ONE
      centroid (the corpus mean), i.e. the same operator with the
      whole corpus as a single cluster, which is precisely SemDeDup
      without its approximation.

    One summary row: ``(n, n_dup_pairs, n_co_clustered, pair_recall,
    n_removed_clustered, n_removed_exact, keep_agreement, n_cells)``.

    Scale: the exact side is the all-pairs O(n²) this audit exists to
    avoid in production — run it at fixture scale or on a sample, like
    every recall audit in the dedup family. The clustered side is the
    production operator unchanged."""
    from .similarity import cosine_expr, ivf_cell_expr

    base = ensure_parallelism(
        df.where(F.col(vec_col).isNotNull())
    ).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        ivf_cell_expr(F.col(vec_col), centroids).alias("cid"),
    )
    pairs = (
        base.alias("a")
        .join(base.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(
            cosine_expr(F.col("a.v"), F.col("b.v")).alias("cs"),
            (F.col("a.cid") == F.col("b.cid")).alias("co"),
        )
        .where(F.col("cs") >= F.lit(threshold))
        .agg(
            F.count(F.lit(1)).alias("n_dup_pairs"),
            F.sum(F.col("co").cast("long")).alias("n_co_clustered"),
        )
    )
    clustered = semantic_dedup_clustered(
        df, centroids, threshold, id_col=id_col, vec_col=vec_col
    ).select(F.col(id_col).alias("id"), F.col("keep").alias("keep_c"))
    # the exact run: one global cluster anchored at the corpus mean —
    # the same rank (distance-to-centroid desc) and the same filter,
    # with no cross-cluster blindness
    dim = len(centroids[0])
    mean = [
        [
            float(x)
            for x in df.select(
                *[
                    F.avg(F.element_at(F.col(vec_col), i + 1)).alias(f"m{i}")
                    for i in range(dim)
                ]
            ).collect()[0]
        ]
    ]
    exact = semantic_dedup_clustered(
        df, mean, threshold, id_col=id_col, vec_col=vec_col
    ).select(F.col(id_col).alias("id"), F.col("keep").alias("keep_e"))
    per_point = clustered.join(exact, "id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~F.col("keep_c")).cast("long")).alias("n_removed_clustered"),
        F.sum((~F.col("keep_e")).cast("long")).alias("n_removed_exact"),
        F.avg(
            (F.col("keep_c") == F.col("keep_e")).cast("double")
        ).alias("keep_agreement"),
    )
    return (
        per_point.crossJoin(F.broadcast(pairs))
        .select(
            "n",
            F.coalesce("n_dup_pairs", F.lit(0)).alias("n_dup_pairs"),
            F.coalesce("n_co_clustered", F.lit(0)).alias("n_co_clustered"),
            F.when(
                F.col("n_dup_pairs") > 0,
                F.col("n_co_clustered") / F.col("n_dup_pairs"),
            )
            .otherwise(F.lit(1.0))
            .alias("pair_recall"),
            "n_removed_clustered",
            "n_removed_exact",
            F.round("keep_agreement", 6).alias("keep_agreement"),
            F.lit(len(centroids)).cast("int").alias("n_cells"),
        )
    )


def keep_best_per_cluster(
    comp: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "mn",
) -> DataFrame:
    """Cluster-CANONICAL selection: given near-dup components and a
    per-doc INTEGER quality score, keep the argmax-quality member of
    every cluster (ties broken by lowest id — a total order, so the
    survivor set is deterministic on any engine). This is the modern
    curation refinement of min-id canonicalization: near-dup groups
    keep their BEST copy (SemDeDup §4, the Gopher/FineWeb dedup
    discipline), not an arbitrary one.

    ``scores`` may be missing rows (e.g. NULL-text docs): absent
    scores rank below every present one (sentinel fold), and a
    cluster with no scored member reports NULL as its kept score.

    Scale: one left join on id (broadcastable when scores are a
    narrow projection) + one groupBy(cluster) whose aggregate is a
    struct-min — map-side combinable, no window sort; output is one
    row per CLUSTER, orders of magnitude under the corpus. Integer
    scores keep the argmax exact (no float tie ambiguity)."""
    low = -(1 << 62)
    j = comp.join(
        scores.select(
            F.col(id_col),
            F.col(score_col).cast("bigint").alias("__s"),
        ),
        id_col,
        "left",
    ).select(
        cluster_col,
        id_col,
        F.coalesce(F.col("__s"), F.lit(low)).alias("__s"),
    )
    agg = j.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min(
            F.struct(
                (-F.col("__s")).alias("neg"),
                F.col(id_col).alias("kept"),
            )
        ).alias("bst"),
    )
    return agg.select(
        cluster_col,
        F.col("n_members").cast("bigint").alias("n_members"),
        (F.col("n_members") - 1).cast("bigint").alias("n_dropped"),
        F.col("bst.kept").alias("kept_" + id_col),
        F.when(-F.col("bst.neg") == F.lit(low), F.lit(None)).otherwise(
            -F.col("bst.neg")
        ).cast("bigint").alias("kept_score"),
    )


def minhash_dedup_increment(
    batch: DataFrame,
    seen: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.5,
    seed: int = 42,
) -> tuple:
    """One INCREMENT of doc-level MinHash near-dup ingestion — the
    signature-state analog of ``line_dedup_increment`` (and the
    streaming form of ``incremental_dedup``): a new batch is gated
    against the KEPT corpus's signature table, then the survivors'
    signatures join the state for the next increment.

    State carries (id, m0..m{k-1}, digest) — FIXED WIDTH per kept doc
    (k 32-bit mins + a 16-byte digest), never text or shingle sets:
    that is the scale story, and why the verifier here is the
    SIGNATURE-AGREEMENT Jaccard estimate (fraction of equal
    components ≥ ``threshold``) rather than the batch operators'
    exact shingle intersection. Identical text ⇒ identical signatures
    ⇒ same bands, so exact duplicates are always candidates; the
    digest column labels them ``exact_dup`` vs ``near_dup``.

    Gate rule (deterministic, oracle-replayable): a doc is dropped
    iff some band-colliding doc with agreement ≥ threshold exists
    among (i) the kept corpus from strictly earlier increments, or
    (ii) LOWER-id docs of the SAME batch regardless of their own
    fate — the standard bulk-ingest approximation (within-batch
    near-dup chains are not fate-resolved; exact-dup chains need no
    resolution since digest equality is transitive).
    ``matched_id`` = the smallest such doc id.

    Returns ``(per_doc, new_state)``: per_doc = (id, status,
    matched_id) for every non-null-text batch doc; new_state = the
    kept docs' signature rows to append to the state table.

    Scale: the only join is on (band, band_key) buckets — probe side
    bounded by batch bands, state side prunable to the probed buckets
    (the ann_dedup_gate discipline); the agreement sum rides the
    band join so the dedup shuffle carries 3 columns."""
    sig_cols = [f"m{i}" for i in range(k)]
    dig = F.md5(normalize_text(F.col(text_col)))
    # The signature frame appears FOUR times in the downstream plan
    # (probe bands, the ref union, and the two output joins); without
    # a cut every evaluation re-runs the k-permutation minhash over
    # the batch text — measured 37 s of a 40 s increment at sf0.1.
    # Lazy localCheckpoint: materialized at the first action, reused
    # by every subsequent subplan (the graph.py discipline).
    sigs = (
        minhash_signatures(batch, text_col, id_col, n, k, seed)
        .join(
            batch.where(F.col(text_col).isNotNull()).select(
                F.col(id_col).alias("__jid"), dig.alias("digest")
            ),
            F.col(id_col) == F.col("__jid"),
        )
        .drop("__jid")
        .localCheckpoint(eager=False)
    )
    ref = sigs.select(
        F.col(id_col).alias("rid"),
        *[F.col(c).alias(f"r_{c}") for c in sig_cols],
        F.col("digest").alias("r_digest"),
        F.lit(False).alias("is_state"),
    )
    if seen is not None:
        ref = ref.unionByName(
            seen.select(
                F.col(id_col).alias("rid"),
                *[F.col(c).alias(f"r_{c}") for c in sig_cols],
                F.col("digest").alias("r_digest"),
                F.lit(True).alias("is_state"),
            )
        )
    r = k // bands

    def _bands(df: DataFrame, idc: str, prefix: str) -> DataFrame:
        structs = []
        for bi in range(bands):
            key = F.concat_ws(
                "|",
                *[
                    F.col(prefix + c)
                    for c in sig_cols[bi * r : (bi + 1) * r]
                ],
            )
            structs.append(
                F.struct(F.lit(bi).alias("band"), key.alias("band_key"))
            )
        return df.withColumn(
            "__b", F.explode(F.array(*structs))
        ).withColumn("band", F.col("__b.band")).withColumn(
            "band_key", F.col("__b.band_key")
        ).drop("__b")

    pb = _bands(sigs, id_col, "")
    rb = _bands(ref, "rid", "r_")
    eq_sum = sum(
        (F.col(c) == F.col(f"r_{c}")).cast("int") for c in sig_cols
    )
    cand = (
        pb.join(
            rb,
            ["band", "band_key"],
        )
        .where(F.col("is_state") | (F.col("rid") < F.col(id_col)))
        .select(
            F.col(id_col),
            F.col("rid"),
            (eq_sum / F.lit(float(k))).alias("est"),
            (F.col("digest") == F.col("r_digest")).alias("dig_eq"),
        )
        .distinct()
    )
    matches = cand.where(F.col("est") >= F.lit(threshold))
    # both outputs join against the match table — cut it so the band
    # join + distinct chain runs once, not twice
    agg = matches.groupBy(id_col).agg(
        F.min("rid").alias("matched_id"),
        F.max(F.col("dig_eq").cast("int")).alias("__anyexact"),
    ).localCheckpoint(eager=False)
    per_doc = (
        sigs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("matched_id").isNull(), F.lit("kept"))
            .when(F.col("__anyexact") == 1, F.lit("exact_dup"))
            .otherwise(F.lit("near_dup"))
            .alias("status"),
            F.col("matched_id"),
        )
    )
    new_state = sigs.join(
        agg.select(id_col), id_col, "left_anti"
    ).select(F.col(id_col), *sig_cols, "digest")
    return per_doc, new_state
