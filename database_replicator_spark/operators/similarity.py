"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — a broadcast join of the (small) query
set against the corpus; per-pair cosine is a sequential JVM fold over the
arrays (zip_with + aggregate), no Python, no shuffle beyond the final top-k.

Scale path: random-hyperplane LSH — h deterministic pseudo-random
hyperplanes (coefficients derived from ``hash60``, so fully reproducible)
map each vector to an h-bit bucket; candidate pairs share a bucket.
At 100 TB: bucket id is a shuffle key with ~uniform fan-out; recall is
tuned with multiple tables (seeds) and multiprobe on neighboring buckets.
An IVF variant (k-means coarse quantizer) would cut candidates further but
needs a training pass; LSH is training-free and fully deterministic, which
we prefer for the reproducibility gate.

Accumulation order note: ``F.aggregate`` folds left-to-right over array
order, which makes the double result bit-deterministic — independent of
partitioning — and lets a DuckDB ``list_reduce`` oracle reproduce it
exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays, in doubles."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    ``queries`` is expected to be small → broadcast; the corpus streams
    through map-side cosine evaluation; the only shuffle is the per-query
    top-k (a window over partitions keyed by query id). Ties broken by
    corpus id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("corpus_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr(F.col("cvec"), F.col("qvec")))
        .select("query_id", "corpus_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def hyperplane_expr(dim: int, plane: int, seed: int = 0) -> Column:
    """Deterministic pseudo-random hyperplane: coefficient j is
    hash60(f"{seed}:{plane}:{j}") mapped to [-1, 1). Reproducible anywhere."""
    return F.array(
        *[
            (hash60(F.lit(f"{seed}:{plane}:{j}")) / F.lit(float(2**59)) - F.lit(1.0))
            for j in range(dim)
        ]
    )


def lsh_bucket_expr(vec: Column, dim: int, num_planes: int = 8, seed: int = 0) -> Column:
    """h-bit random-hyperplane signature as a long (bit p = sign of the
    dot product with plane p)."""
    sig = None
    for p in range(num_planes):
        d = dot_expr(vec, hyperplane_expr(dim, p, seed))
        bit = F.when(d >= 0, F.lit(2**p).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        sig = bit if sig is None else sig + bit
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine evaluated only for corpus vectors in
    the query's LSH bucket. Equi-join on bucket replaces the cross join —
    the scale win. Recall < 1; raise num tables/probes for more."""
    cb = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("cvec"),
        lsh_bucket_expr(F.col(vec_col), dim, num_planes, seed).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        lsh_bucket_expr(F.col(vec_col), dim, num_planes, seed).alias("bucket"),
    )
    scored = (
        cb.join(F.broadcast(qb), on="bucket")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr(F.col("cvec"), F.col("qvec")))
        .select("query_id", "corpus_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def neardup_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold — brute force O(n²),
    correct-but-small-scale; the LSH bucket join above is the scale path."""
    a = corpus.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    b = corpus.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    return (
        a.crossJoin(b)
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("cosine", cosine_expr(F.col("v1"), F.col("v2")))
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )
