"""Scalar-quantization (SQ8) ANN over the embeddings table
(beyond-reference surface: the ANN family's simplest compressed-scan
member, FAISS ``IndexScalarQuantizer(QT_8bit)`` shape).

Where PQ learns a codebook, SQ8 just stores each dimension as one byte
with a per-vector scale: ``code_i = round(qvec_i * 127 / m)`` with
``m = max_i |qvec_i|`` — an 8× scan-size cut (64-dim int64 → 64 bytes)
with zero training. Search scores candidates from codes alone:

    cos~(a, b) = (Σ ca_i·cb_i) · ma · mb / 127² / √n2a / √n2b

Determinism (the oracle story, same recipe as operators/pq.py):

- ``m`` is an exact integer max over exact integers;
- each code is ONE IEEE multiply + divide + round on exact int64
  inputs (the pq._with_unit precedent — bit-reproducible in DuckDB);
- the code dot product is an exact int64 sum;
- the approximate cosine applies a FIXED IEEE operation order
  (cast → ·ma → ·mb → /127² → /√n2a → /√n2b), so DuckDB reproduces
  every score bit-for-bit and rank boundaries can't drift.

Execution shape (the 100 TB plan): encoding is one map-side pass over
the session-cached quantized corpus (no shuffle — the stored index, cf.
similarity.quantized_corpus's build-once/serve-many contract); search
is the same broadcast-queries-over-streaming-corpus contract as
knn_brute_force, but each candidate contributes a 64-byte code row
instead of a 512-byte raw vector — the memory-bandwidth win is the
point of scalar quantization. At larger N the distributive partial
top-k (knn_brute_force_matmul's shape) applies unchanged.

Cited parity anchor: reference has no ANN surface; extends SURVEY.md §2
extension block (similarity-search family alongside brute force / IVF /
LSH / PQ).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .similarity import quantized_corpus

SQ8_MAX = 127
SQ8_QUERY_MOD = 100
SQ8_K = 5


def sq8_encode(emb: DataFrame) -> DataFrame:
    """(vec_id, label, qnorm2, m, code): per-vector symmetric int8
    quantization. Map-side only — no shuffle, no join."""
    m = F.array_max(F.transform(F.col("qvec"), lambda v: F.abs(v)))
    return emb.select(
        "vec_id",
        "label",
        "qnorm2",
        m.alias("m"),
        F.transform(
            F.col("qvec"),
            lambda v: F.round(
                v.cast("double") * SQ8_MAX / F.col("m")
            ).cast("long"),
        ).alias("code"),
    ).filter(F.col("m") > 0)


def sq8_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached SQ8 code table — the stored index (build-once/
    serve-many, same lifecycle as pq.pq_codes; at 100 TB a written
    table of 64-byte rows)."""
    from ..sources.catalog import session_cache

    cache = session_cache(spark, "_sg_sq8_index_cache")
    key = os.path.abspath(sf_dir)
    hit = cache.get(key)
    if hit is None:
        emb, _ = quantized_corpus(spark, sf_dir)
        hit = sq8_encode(emb).localCheckpoint(eager=True)
        cache[key] = hit
    return hit


def _code_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def knn_sq8(
    spark: SparkSession,
    sf_dir: str,
    query_mod: int = SQ8_QUERY_MOD,
    k: int = SQ8_K,
) -> DataFrame:
    """Top-k by SQ8 approximate cosine for query vectors (vec_id %
    query_mod == 0), self-matches excluded; rank ties on neighbor_id.
    Same broadcast-bound contract as knn_brute_force."""
    codes = sq8_index(spark, sf_dir)
    q = codes.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("code").alias("q_code"),
        F.col("m").alias("q_m"),
        F.col("qnorm2").alias("q_qnorm2"),
    )
    scored = (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                _code_dot(F.col("q_code"), F.col("code")).cast("double")
                * F.col("q_m").cast("double")
                * F.col("m").cast("double")
                / F.lit(float(SQ8_MAX * SQ8_MAX))
                / F.sqrt(F.col("q_qnorm2").cast("double"))
                / F.sqrt(F.col("qnorm2").cast("double"))
            ).alias("sq8_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sq8_cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


SQ8_CTE_SQL = f"""
sq8m AS (
    SELECT vec_id, label, qvec, qnorm2,
        list_max(list_transform(qvec, v -> abs(v))) AS m
    FROM qnormed
),
sq8codes AS (
    SELECT vec_id, label, qnorm2, m,
        list_transform(qvec,
            v -> CAST(ROUND(CAST(v AS DOUBLE) * {SQ8_MAX} / m) AS BIGINT))
            AS code
    FROM sq8m
    WHERE m > 0
)
"""


def _sql_code_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({a})),"
        f" i -> {a}[i] * {b}[i]))"
    )


def knn_sq8_sql(query_mod: int = SQ8_QUERY_MOD, k: int = SQ8_K) -> str:
    dot = _sql_code_dot("a.q_code", "b.code")
    return f"""(
    WITH sq8q AS (
        SELECT vec_id AS query_id, code AS q_code, m AS q_m,
            qnorm2 AS q_qnorm2
        FROM sq8codes WHERE vec_id % {query_mod} = 0
    ),
    sq8scored AS (
        SELECT a.query_id, b.vec_id AS neighbor_id,
            CAST({dot} AS DOUBLE) * CAST(a.q_m AS DOUBLE)
                * CAST(b.m AS DOUBLE) / {float(SQ8_MAX * SQ8_MAX)}
                / sqrt(CAST(a.q_qnorm2 AS DOUBLE))
                / sqrt(CAST(b.qnorm2 AS DOUBLE)) AS sq8_cos
        FROM sq8q a
        CROSS JOIN sq8codes b
        WHERE b.vec_id != a.query_id
    )
    SELECT query_id, neighbor_id, sq8_cos, CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY sq8_cos DESC, neighbor_id) AS rank
        FROM sq8scored
    ) r
    WHERE rank <= {k}
) s"""
