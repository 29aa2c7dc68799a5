"""Embedding similarity search over the `embeddings` table
(vec_id, embedding float[64], label).

Two paths (SURVEY-mandated ANN component of the training-data suite):
- ``cosine_topk``   — exact brute-force top-k (the correctness
  baseline; O(n^2) cross join, fine for dim tables / oracle scale).
- ``ann_lsh_topk``  — random-hyperplane LSH buckets (sign-bit
  signature over P fixed literal planes) + top-k within bucket: the
  100-TB path (bucket equi-join replaces the n^2 cross join).

Both are pure JVM column arithmetic: the 64-term dot product is
generated as an explicit left-associative expression, identical
(term-for-term, cast-for-cast) to the DuckDB SQL the oracle runs, so
cosine scores and orderings are bit-identical.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DIM = 64
N_PLANES = 8
_PLANE_SEED = 20260816


def _dot_terms_spark(a: str, b: str) -> str:
    return " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
        for i in range(DIM)
    )


def _dot_terms_duck(a: str, b: str) -> str:
    return " + ".join(
        f"CAST({a}[{i + 1}] AS DOUBLE) * CAST({b}[{i + 1}] AS DOUBLE)"
        for i in range(DIM)
    )


def _with_norm_spark(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "nrm", F.expr(f"sqrt({_dot_terms_spark('embedding', 'embedding')})")
    )


def cosine_topk(emb: DataFrame, k: int) -> DataFrame:
    """Exact top-k cosine neighbors per vector (self excluded).
    Output (vec_id, neighbor_id, cosine, rn) ordered by
    (cosine desc, neighbor_id)."""
    a = _with_norm_spark(emb).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    b = _with_norm_spark(emb).select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").alias("ne"),
        F.col("nrm").alias("nn"),
    )
    pairs = a.crossJoin(b).where(F.col("qid") != F.col("nid"))
    cos = F.expr(f"({_dot_terms_spark('qe', 'ne')})") / (
        F.col("qn") * F.col("nn")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col("nid"))
    return (
        pairs.withColumn("cosine", cos)
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= k)
        .select(
            F.col("qid").alias("vec_id"),
            F.col("nid").alias("neighbor_id"),
            "cosine",
            "rn",
        )
    )


def cosine_topk_sql(k: int, table: str = "embeddings") -> str:
    dot = _dot_terms_duck("a.embedding", "b.embedding")
    norm = _dot_terms_duck("embedding", "embedding")
    return f"""
WITH nrm AS (SELECT vec_id, embedding, sqrt({norm}) AS nrm FROM {table}),
pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         ({dot}) / (a.nrm * b.nrm) AS cosine
  FROM nrm a CROSS JOIN nrm b WHERE a.vec_id != b.vec_id
)
SELECT vec_id, neighbor_id, cosine, rn FROM (
  SELECT vec_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, neighbor_id) AS rn
  FROM pairs
) WHERE rn <= {k}"""


def lsh_planes() -> np.ndarray:
    """P deterministic hyperplanes (fixed seed); literals shared by the
    Spark plan and the SQL oracle."""
    rng = np.random.default_rng(_PLANE_SEED)
    return rng.standard_normal((N_PLANES, DIM))


def _bucket_expr_spark(col: str, planes: np.ndarray) -> str:
    bits = []
    for p in planes:
        dot = " + ".join(
            f"CAST({col}[{i}] AS DOUBLE) * CAST('{p[i]!r}' AS DOUBLE)"
            for i in range(DIM)
        )
        bits.append(f"(CASE WHEN ({dot}) >= 0 THEN '1' ELSE '0' END)")
    return "concat(" + ", ".join(bits) + ")"


def _bucket_expr_duck(col: str, planes: np.ndarray) -> str:
    bits = []
    for p in planes:
        dot = " + ".join(
            f"CAST({col}[{i + 1}] AS DOUBLE) * CAST('{p[i]!r}' AS DOUBLE)"
            for i in range(DIM)
        )
        bits.append(f"(CASE WHEN ({dot}) >= 0 THEN '1' ELSE '0' END)")
    return " || ".join(bits)


def ann_lsh_topk(emb: DataFrame, k: int) -> DataFrame:
    """Approximate top-k: candidates restricted to the same LSH bucket
    (equi-join on the sign signature — the scale path)."""
    planes = lsh_planes()
    withb = _with_norm_spark(emb).withColumn(
        "bucket", F.expr(_bucket_expr_spark("embedding", planes))
    )
    a = withb.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"), "bucket",
    )
    b = withb.select(
        F.col("vec_id").alias("nid"), F.col("embedding").alias("ne"),
        F.col("nrm").alias("nn"), F.col("bucket").alias("bucket2"),
    )
    pairs = a.join(b, (F.col("bucket") == F.col("bucket2")) & (F.col("qid") != F.col("nid")))
    cos = F.expr(f"({_dot_terms_spark('qe', 'ne')})") / (
        F.col("qn") * F.col("nn")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col("nid"))
    return (
        pairs.withColumn("cosine", cos)
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= k)
        .select(
            F.col("qid").alias("vec_id"),
            F.col("nid").alias("neighbor_id"),
            "cosine",
            "rn",
        )
    )


def ann_lsh_topk_sql(k: int, table: str = "embeddings") -> str:
    planes = lsh_planes()
    dot = _dot_terms_duck("a.embedding", "b.embedding")
    norm = _dot_terms_duck("embedding", "embedding")
    bucket = _bucket_expr_duck("embedding", planes)
    return f"""
WITH nrm AS (SELECT vec_id, embedding, sqrt({norm}) AS nrm,
                    {bucket} AS bucket FROM {table}),
pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         ({dot}) / (a.nrm * b.nrm) AS cosine
  FROM nrm a JOIN nrm b
    ON a.bucket = b.bucket AND a.vec_id != b.vec_id
)
SELECT vec_id, neighbor_id, cosine, rn FROM (
  SELECT vec_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, neighbor_id) AS rn
  FROM pairs
) WHERE rn <= {k}"""
