"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline; IVF-style
coarse-quantizer bucketing as the scale path. Vector math stays
JVM-side (zip_with/aggregate — codegen'd, no Python); the only Python
is the optional Arrow-batched pandas UDF variant used when numpy BLAS
beats codegen for very wide vectors.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W
from pyspark.sql.functions import pandas_udf


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query row.

    queries is broadcast (it is small by construction — a query batch),
    so the corpus is scanned once with no shuffle; the per-query top-k
    is a window over (query, cosine) — at scale replace with
    groupBy(query).agg(max_by-heap) if k is tiny, but
    TakeOrderedAndProject already handles this shape well.
    """
    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qv"), _norm(vec_col).alias("_qn")
    )
    v = vectors.select(
        F.col(id_col).alias("_vid"), F.col(vec_col).alias("_vv"), _norm(vec_col).alias("_vn")
    )
    scored = v.crossJoin(F.broadcast(q)).select(
        "_qid",
        "_vid",
        (_dot("_qv", "_vv") / (F.col("_qn") * F.col("_vn"))).alias("cosine"),
    )
    w = W.partitionBy("_qid").orderBy(F.desc("cosine"), F.asc("_vid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_vid").alias(id_col),
            F.round("cosine", 4).alias("cosine"),
            F.col("_rn").alias("rank"),
        )
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """IVF (inverted-file) ANN: corpus rows are assigned to their nearest
    centroid (one broadcast pass); each query probes only its n_probe
    nearest centroid cells. At 10^9 vectors this turns a full scan into
    ~n_probe/n_cells of the corpus, partitioned by cell — the classic
    coarse-quantizer layout (IVF-Flat), expressed entirely as joins.

    centroids: (centroid_id, embedding). Training the centroids is out
    of scope (any k-means; they just need to be fixed inputs).
    """
    c = centroids.select(
        F.col(centroid_id_col).alias("_cid"), F.col(vec_col).alias("_cv"), _norm(vec_col).alias("_cn")
    )
    v = vectors.select(
        F.col(id_col).alias("_vid"), F.col(vec_col).alias("_vv"), _norm(vec_col).alias("_vn")
    )
    # assign corpus → nearest centroid (broadcast centroids; 1 scan)
    vc = v.crossJoin(F.broadcast(c)).select(
        "_vid", "_vv", "_vn", "_cid", (_dot("_vv", "_cv") / (F.col("_vn") * F.col("_cn"))).alias("_sim")
    )
    wv = W.partitionBy("_vid").orderBy(F.desc("_sim"), F.asc("_cid"))
    assigned = vc.withColumn("_rn", F.row_number().over(wv)).filter(F.col("_rn") == 1).select(
        "_vid", "_vv", "_vn", "_cid"
    )
    # query → n_probe nearest cells
    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qv"), _norm(vec_col).alias("_qn")
    )
    qc = q.crossJoin(F.broadcast(c)).select(
        "_qid", "_qv", "_qn", "_cid", (_dot("_qv", "_cv") / (F.col("_qn") * F.col("_cn"))).alias("_sim")
    )
    wq = W.partitionBy("_qid").orderBy(F.desc("_sim"), F.asc("_cid"))
    probes = qc.withColumn("_rn", F.row_number().over(wq)).filter(F.col("_rn") <= n_probe).select(
        "_qid", "_qv", "_qn", "_cid"
    )
    # search only within probed cells (equi-join on cell id)
    scored = assigned.join(F.broadcast(probes), "_cid").select(
        "_qid", "_vid", (_dot("_qv", "_vv") / (F.col("_qn") * F.col("_vn"))).alias("cosine")
    )
    w = W.partitionBy("_qid").orderBy(F.desc("cosine"), F.asc("_vid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_vid").alias(id_col),
            F.round("cosine", 4).alias("cosine"),
            F.col("_rn").alias("rank"),
        )
    )


def make_cosine_udf(ref_vec: list[float]):
    """Arrow-batched vectorized cosine vs a fixed reference vector —
    the numpy-BLAS path for very wide vectors where zip_with/aggregate
    codegen loses. Built lazily (pandas_udf needs an active session).
    Not used in catalog oracles (float summation order differs across
    engines); exercised in tests."""
    import numpy as np

    ref = np.asarray(ref_vec, dtype="float64")
    ref_n = np.linalg.norm(ref) + 1e-12

    @pandas_udf("double")
    def cosine_udf(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())
        sims = (m @ ref) / (np.linalg.norm(m, axis=1) * ref_n + 1e-12)
        return pd.Series(sims)

    return cosine_udf
