"""Similarity search over the ``embeddings`` table (``array<float>``, 64-d).

LLM-pipeline extension (driver spec, SURVEY §7.6): brute-force cosine top-k
as the correctness baseline, random-hyperplane LSH bucketing as the scale
path, and embedding-cosine near-duplicate pairs.

Numeric determinism: all vector math is promoted to DOUBLE on both sides
(DuckDB's ``list_cosine_similarity`` computes in float32 when fed FLOAT[] —
the oracles cast to DOUBLE[] explicitly), and similarities are rounded
before comparison so sequential-summation differences below 1e-6 can't
break the hash.

Scale notes (100 TB posture):
- brute-force top-k is one narrow map (JVM-side `aggregate`/`zip_with`, no
  Python) + TakeOrderedAndProject — scans N rows once, no shuffle.
- LSH bucketing maps each vector to a bucket id (narrow), then groups by
  bucket: one shuffle keyed by bucket; pair generation stays within buckets.
- hyperplanes are compile-time literals (seeded), broadcast implicitly as
  part of the plan — no driver-side collect of data.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import rnd
from ..lake.tables import load_table

_DIM = 64


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate({a}, cast(0.0 as double),"
            " (acc, v) -> acc + cast(v as double) * cast(v as double))"
        )
    )


# -- brute-force cosine top-k vs an in-data query vector ----------------------


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    query = (
        emb.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("q"))
    )
    sim = _dot("embedding", "q") / (_norm("embedding") * _norm("q"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(query))
        .select("vec_id", rnd(sim, 4).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


_COSINE_TOPK_SQL = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       floor((list_cosine_similarity(embedding::DOUBLE[], qv)) * 10000.0 + 0.5) / 10000.0 AS cos_sim
FROM embeddings, q
WHERE vec_id != 0
ORDER BY cos_sim DESC, vec_id
LIMIT 10
"""

# -- per-label norm statistics (exercises aggregate() over arrays) ------------


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", _norm("embedding").alias("norm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            rnd(F.avg("norm"), 4).alias("avg_norm"),
            rnd(F.max("norm"), 4).alias("max_norm"),
        )
        .orderBy("label")
    )


_NORM_STATS_SQL = """
SELECT label, count(*) AS n,
       floor((avg(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))))) * 10000.0 + 0.5) / 10000.0 AS avg_norm,
       floor((max(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))))) * 10000.0 + 0.5) / 10000.0 AS max_norm
FROM embeddings
GROUP BY label
ORDER BY label
"""

# -- random-hyperplane LSH bucketing (the ANN scale path) ---------------------

_rng = random.Random(20260813)
_PLANES = [
    [round(_rng.gauss(0.0, 1.0), 6) for _ in range(_DIM)] for _ in range(8)
]


def _plane_lit(p: list[float]) -> str:
    return "array(" + ", ".join(f"cast({v!r} as double)" for v in p) + ")"


def lsh_bucket_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    bucket = sum(
        [
            F.when(_dot("embedding", _plane_lit(p)) > 0, F.lit(1 << i)).otherwise(
                F.lit(0)
            )
            for i, p in enumerate(_PLANES)
        ],
        F.lit(0),
    )
    return (
        emb.select("vec_id", bucket.cast("int").alias("bucket"))
        .orderBy("vec_id")
    )


def _lsh_sql() -> str:
    terms = []
    for i, p in enumerate(_PLANES):
        lit = "[" + ", ".join(repr(v) for v in p) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_sum(list_transform(list_zip(embedding::DOUBLE[], {lit}),"
            f" x -> x[1] * x[2])) > 0 THEN {1 << i} ELSE 0 END)"
        )
    expr = " + ".join(terms)
    return f"""
SELECT vec_id, CAST({expr} AS INTEGER) AS bucket
FROM embeddings
ORDER BY vec_id
"""


# -- embedding-cosine near-duplicate pairs (bounded brute force) --------------


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")
    )
    sim = _dot("ea", "eb") / (_norm("ea") * _norm("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", rnd(sim, 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.5)
        .orderBy("vec_a", "vec_b")
    )


_NEAR_DUP_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 300)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       floor((list_cosine_similarity(a.v, b.v)) * 10000.0 + 0.5) / 10000.0 AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE floor((list_cosine_similarity(a.v, b.v)) * 10000.0 + 0.5) / 10000.0 >= 0.5
ORDER BY vec_a, vec_b
"""


QUERIES = {
    "cosine_topk": cosine_topk,
    "embedding_norm_stats": embedding_norm_stats,
    "lsh_bucket_assignments": lsh_bucket_assignments,
    "embedding_near_dup_pairs": embedding_near_dup_pairs,
}

ORACLE = {
    "cosine_topk": _COSINE_TOPK_SQL,
    "embedding_norm_stats": _NORM_STATS_SQL,
    "lsh_bucket_assignments": _lsh_sql(),
    "embedding_near_dup_pairs": _NEAR_DUP_SQL,
}
