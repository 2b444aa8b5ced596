"""Deduplication operator family for training-data pipelines.

The reference dedupes per exact key (FNV hash set, deduper/hashmap.go;
anti-join on (link,title), core_logic.py:273-274). At 100 TB corpus
scale the same concern generalizes to content-level near-dup removal;
these operators extend the family. All are pure DataFrame ops — hash
work happens JVM-side (xxhash64/codegen), pair generation is bounded by
LSH banding so nothing is O(n^2) except the final verify on candidate
pairs.

Scale notes per operator are in the docstrings; the catalog variants in
plans/queries.py re-express the same algorithms with LCG dictionary
hashing so a DuckDB oracle can verify them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def exact_dedupe(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedupe via hash-groupBy: one winner (min id) per distinct
    content. Single shuffle on the content hash; partial agg map-side."""
    h = F.xxhash64(*content_cols).alias("_h")
    return (
        df.select(h, F.col(id_col))
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop("_h")
    )


def _shingles(text_col: str, k: int):
    """Word k-shingles as an array column (distinct).

    k=2 uses zip_with over two slices — transform+element_at/slice
    inside a lambda re-evaluates the split() per element (no
    common-subexpression elimination across lambda boundaries), which
    makes shingling O(n^2) per row; measured 2x end-to-end."""
    words = F.split(F.col(text_col), r"\s+")
    if k == 1:
        return F.array_distinct(words)
    n = F.size(words)
    if k == 2:
        return F.when(
            n >= 2,
            F.array_distinct(
                F.zip_with(
                    F.slice(words, 1, n - 1), F.slice(words, 2, n - 1),
                    lambda x, y: F.concat_ws(" ", x, y),
                )
            ),
        ).otherwise(F.array_distinct(words))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
            lambda i: F.array_join(F.slice(words, i + 1, k), " "),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH near-dup candidate pairs, verified by true Jaccard.

    shingle → minhash (num_hashes permutations of xxhash64) → band →
    bucket-join → exact Jaccard on candidates only. The band join is
    the only shuffle that can skew: identical boilerplate docs all land
    in one bucket — the candidate join is therefore done on
    (band_id, signature) with the pair count per bucket bounded
    upstream by dropDuplicates on (id, band, sig).

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    rows_per_band = num_hashes // bands
    sh = df.select(F.col(id_col).alias("_id"), _shingles(text_col, shingle_k).alias("_sh"))
    exploded = sh.select("_id", F.explode("_sh").alias("_s"))
    hashed = exploded.select(
        "_id", *[((F.xxhash64(F.concat(F.lit(f"h{i}:"), F.col("_s"))))).alias(f"_h{i}") for i in range(num_hashes)]
    )
    sig = hashed.groupBy("_id").agg(*[F.min(f"_h{i}").alias(f"_m{i}") for i in range(num_hashes)])
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("-", *[F.col(f"_m{b * rows_per_band + r}") for r in range(rows_per_band)]).alias("sig"),
        )
        for b in range(bands)
    ]
    banded = sig.select("_id", F.explode(F.array(*band_cols)).alias("_b")).select(
        "_id", F.col("_b.band").alias("_band"), F.col("_b.sig").alias("_sig")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, (F.col("a._band") == F.col("b._band")) & (F.col("a._sig") == F.col("b._sig")) & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    return _verify_jaccard(cand, sh, jaccard_threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 1,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via a PREFIX-FILTERED inverted index
    (PPJoin-style). Shingles are globally ordered rarest-first (document
    frequency, ties by value); each doc indexes only its first
    n - ceil(t*n) + 1 shingles. Any pair with Jaccard >= t shares an
    indexed shingle in both prefixes (prefix-filtering theorem), so the
    posting self-join touches only rare postings — on skewed/shared-
    vocab corpora this cuts candidate mass by orders of magnitude vs
    the naive inverted index while staying exact. Candidates are
    verified with the true full-set intersection."""
    t = jaccard_threshold
    sh = df.select(F.col(id_col).alias("_id"), _shingles(text_col, shingle_k).alias("_sh"))
    post = sh.select("_id", F.size("_sh").alias("_n"), F.explode("_sh").alias("_s"))
    df_tbl = post.groupBy("_s").agg(F.count(F.lit(1)).alias("_df"))
    ranked = post.join(F.broadcast(df_tbl), "_s").withColumn(
        "_rn", F.row_number().over(W.partitionBy("_id").orderBy("_df", "_s"))
    )
    prefix = ranked.filter(
        F.col("_rn") <= F.col("_n") - F.ceil(F.lit(t) * F.col("_n")) + 1
    ).select("_id", "_s")
    a = prefix.alias("a")
    b = prefix.alias("b")
    cand = (
        a.join(b, (F.col("a._s") == F.col("b._s")) & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    return _verify_jaccard(cand, sh, t)


def _verify_jaccard(cand: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    sa = sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sha"))
    sb = sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_shb"))
    j = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("_i", F.size(F.array_intersect("_sha", "_shb")))
        .withColumn("jaccard", F.col("_i") / (F.size("_sha") + F.size("_shb") - F.col("_i")))
    )
    return j.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
) -> DataFrame:
    """SimHash fingerprint: per word-hash, each bit votes +1/-1; the
    sign vector packs into an int. Hamming-close fingerprints = near
    dups. One explode + one groupBy (single shuffle)."""
    words = df.select(
        F.col(id_col).alias("_id"), F.explode(F.split(F.col(text_col), r"\s+")).alias("_w")
    )
    h = F.xxhash64("_w")
    votes = words.groupBy("_id").agg(
        *[
            F.sum(F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"_b{i}")
            for i in range(bits)
        ]
    )
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"_b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return votes.select(F.col("_id").alias(id_col), fp.cast("long").alias("simhash"))


def simhash_pairs(fps: DataFrame, id_col: str = "doc_id", max_hamming: int = 2, bits: int = 16) -> DataFrame:
    """Near-dup pairs by Hamming distance <= max_hamming, bucketed by
    simhash block (pigeonhole: split fingerprint into max_hamming+1
    blocks; near pairs share at least one block) — avoids all-pairs."""
    nblocks = max_hamming + 1
    block_bits = bits // nblocks
    mask = (1 << block_bits) - 1
    blocks = fps.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright("simhash", i * block_bits).bitwiseAND(F.lit(mask)).alias("val"),
                    )
                    for i in range(nblocks)
                ]
            )
        ).alias("_b"),
    ).select(id_col, "simhash", F.col("_b.blk").alias("_blk"), F.col("_b.val").alias("_val"))
    a = blocks.alias("a")
    b = blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a._val") == F.col("b._val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("_fa"),
            F.col("b.simhash").alias("_fb"),
        )
        .distinct()
    )
    xor = F.col("_fa").bitwiseXOR(F.col("_fb"))
    ham = F.bit_count(xor)
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    lsh_planes: int = 0,
    lsh_bands: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs by cosine similarity.

    lsh_planes=0: all-pairs (test scale only). lsh_planes=k: random-
    hyperplane LSH — pairs are only compared within a sign-bucket, the
    scale path.

    SIZING (the part that matters at 10^9+ vectors): expected in-bucket
    pair count is ~ n^2 / 2^k, so k must GROW with the corpus — use
    k ≈ 2·log2(n) to keep expected bucket occupancy ~1 (n=10^9 →
    k ≈ 60, capped at 62 for the long bucket). A single k-plane band
    has recall (1 - θ/π)^k for angle θ, which collapses for large k, so
    pair large k with ``lsh_bands`` > 1 independent bands OR'd together
    (candidate iff same bucket in ANY band) — the standard
    bands/rows LSH trade: recall 1 - (1 - p^k)^b. Each band uses an
    independent LCG seed; candidates are deduped before emit."""
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x))
    base = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), norm.alias("_n"))
    if lsh_planes:
        bands = max(1, lsh_bands)
        base = base.select(
            "_id", "_v", "_n",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bd).alias("band"),
                            _hyperplane_bucket("_v", lsh_planes, seed + bd * 104729).alias("bkt"),
                        )
                        for bd in range(bands)
                    ]
                )
            ).alias("_bb"),
        ).select("_id", "_v", "_n", F.col("_bb.band").alias("_band"), F.col("_bb.bkt").alias("_bkt"))
        join_cond = lambda a, b: (  # noqa: E731
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bkt") == F.col("b._bkt"))
            & (F.col("a._id") < F.col("b._id"))
        )
    else:
        join_cond = lambda a, b: F.col("a._id") < F.col("b._id")  # noqa: E731
    a = base.alias("a")
    b = base.alias("b")
    dot = F.aggregate(F.zip_with("a._v", "b._v", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    pairs = a.join(b, join_cond(a, b)).select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        (dot / (F.col("a._n") * F.col("b._n"))).alias("cosine"),
    )
    out = pairs.filter(F.col("cosine") >= threshold).select(
        "id_a", "id_b", F.round("cosine", 4).alias("cosine")
    )
    # multi-band OR finds the same pair in >1 band — dedupe before emit
    return out.dropDuplicates(["id_a", "id_b"]) if lsh_planes and lsh_bands > 1 else out


def _hyperplane_bucket(vec_col: str, planes: int, seed: int):
    """Sign-bit bucket from LCG-deterministic hyperplanes (no RNG object
    — reproducible across runs and engines)."""
    from etl_gmaps_spark.datagen import LCG_A, LCG_C, LCG_M

    bucket = F.lit(0)
    for p in range(planes):
        # weight(p, d) in [-1, 1): ((mix(p*997+d) % 2001) - 1000) / 1000
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.transform(
                    F.sequence(F.lit(0), F.size(vec_col) - 1),
                    lambda d: (
                        ((d.cast("long") + F.lit(p * 997 + seed)) * F.lit(LCG_A) + F.lit(LCG_C))
                        % F.lit(LCG_M)
                        % 2001
                        - 1000
                    ).cast("double")
                    / 1000.0,
                ),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket.cast("int")
