"""K-means clustering over the embeddings table (beyond-reference
surface): Lloyd's algorithm, Spark-first, bit-exactly oracle-checkable.

The classic obstacle to verifying iterative float ML across engines is
summation-order drift: double means differ in the last ulp, boundary
points flip clusters, and results diverge. This implementation removes
float nondeterminism entirely:

- vectors are integer-quantized (round(x·SCALE) per dim) — same scheme
  as operators/similarity.py;
- a centroid is held as exact integer state ``(s, c)`` = (per-dim sum of
  member vectors, member count) — never a float mean;
- the squared distance to centroid j, dropping the ‖x‖² term constant
  in the argmin, is  d_j = (‖s_j‖² − 2·c_j·⟨x,s_j⟩) / c_j²  — an exact
  int64 numerator and denominator with ONE double division at the end.
  The same two ints divide identically under IEEE-754 in any engine, so
  assignments (ties broken by smallest cluster_id) are deterministic and
  DuckDB reproduces every iteration bit-for-bit.

Execution shape (the way k-means is actually run on a cluster —
Spark MLlib's own KMeans does the same): per iteration, one map pass
computes each row's nearest centroid against the k centroids — packed
into a SINGLE broadcast row as a sorted array of (cluster_id, s, c,
s2) structs, with the argmin evaluated by ``F.aggregate`` over that
array (JVM-side, no per-row expansion, no shuffle) — and one
groupBy(cluster) reduces the k·dim integer sums (map-side combine →
k rows). Centroid state is chained as a k-row DataFrame with
``localCheckpoint`` truncating lineage between rounds — NOTHING is
collected to the driver at any point; iterations are pure
DataFrame-to-DataFrame.

Int64 bounds: |qx_i| ≤ SCALE·max|x| ≈ 530; ⟨x,s_j⟩ ≤ dim·530²·c_j;
the numerator ≤ c_j²·dim·530² ⇒ exact while c_j ≤ ~3·10⁶ members at
dim 64. Beyond that, production would switch the argmin to double
means — documented trade; the oracle path needs the exact form.

Cited parity anchor: reference has no clustering surface; this extends
the corpus-prep story (SURVEY.md §2 extension block, BASELINE.json
"text analysis" north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table

KMEANS_K = 8
KMEANS_ITERS = 2
KMEANS_SCALE = 1000
_DIM = 64  # fixture embedding dimensionality (asserted at runtime)


def _quantize(vec: Column) -> Column:
    return F.transform(
        vec.cast("array<double>"),
        lambda x: F.round(x * KMEANS_SCALE).cast("long"),
    )


def _qframe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", _quantize(F.col("embedding")).alias("qx"))
    return q.withColumn(
        "n2x",
        F.aggregate(
            F.transform(F.col("qx"), lambda v: v * v),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )


def _pack_centroids(cent: DataFrame) -> DataFrame:
    """k-row (cluster_id, s, c) state → ONE row holding the sorted
    array of (cluster_id, s, c, s2) structs; broadcast-joined onto the
    corpus so the per-row argmin runs as a pure JVM expression."""
    ct = F.struct(
        F.col("cluster_id"),
        F.col("s"),
        F.col("c"),
        F.aggregate(
            F.transform(F.col("s"), lambda v: v * v),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("s2"),
    )
    return cent.select(ct.alias("ct")).agg(
        F.array_sort(F.collect_list("ct")).alias("cents")
    )


def _dot_ct(ct: Column) -> Column:
    return F.aggregate(
        F.zip_with(F.col("qx"), ct["s"], lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _reduced_d(ct: Column) -> Column:
    """d_j = (‖s_j‖² − 2·c_j·⟨x,s_j⟩) / c_j² — exact int64 numerator
    and denominator, one double division (argmin-equivalent distance,
    the ‖x‖² term dropped)."""
    num = ct["s2"] - F.lit(2).cast("long") * ct["c"] * _dot_ct(ct)
    return num.cast("double") / (ct["c"] * ct["c"]).cast("double")


def _with_assignment(q: DataFrame, cents_row: DataFrame) -> DataFrame:
    """cluster_id = argmin_j d_j, ties to the smallest j: a fold over
    the sorted centroid array with strict `<` keeps the earliest
    (lowest-id) minimum — identical tie semantics to the SQL twin's
    ORDER BY d, cluster_id."""
    init = F.struct(
        F.lit(float("inf")).alias("d"),
        F.lit(-1).cast("long").alias("cluster_id"),
    )
    best = F.aggregate(
        F.col("cents"),
        init,
        lambda acc, ct: F.when(
            _reduced_d(ct) < acc["d"],
            F.struct(
                _reduced_d(ct).alias("d"), ct["cluster_id"].alias("cluster_id")
            ),
        ).otherwise(acc),
    )
    return q.crossJoin(F.broadcast(cents_row)).withColumn(
        "cluster_id", best["cluster_id"]
    )


def _next_centroids(assigned: DataFrame, prev_cent: DataFrame) -> DataFrame:
    """One reduce pass: per-cluster per-dim integer sums + counts
    (map-side combined → k rows). Empty clusters carry their previous
    state forward (standard Lloyd's fallback, mirrored in the oracle's
    LEFT JOIN/COALESCE)."""
    aggs = [
        F.sum(F.element_at("qx", i + 1)).alias(f"s{i}") for i in range(_DIM)
    ] + [F.count("*").alias("c")]
    new = (
        assigned.groupBy("cluster_id")
        .agg(*aggs)
        .select(
            "cluster_id",
            F.array(*[F.col(f"s{i}") for i in range(_DIM)]).alias("s"),
            F.col("c"),
        )
    )
    return (
        prev_cent.alias("p")
        .join(new.alias("n"), "cluster_id", "left")
        .select(
            "cluster_id",
            F.coalesce(F.col("n.s"), F.col("p.s")).alias("s"),
            F.coalesce(F.col("n.c"), F.col("p.c")).cast("long").alias("c"),
        )
        .localCheckpoint()
    )


def kmeans_clusters(
    spark: SparkSession,
    sf_dir: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
) -> DataFrame:
    """Run ``iters`` Lloyd's rounds from deterministic seeds (the k
    lowest vec_ids, one member each) and return per-cluster stats of
    the final assignment: size and inertia (sum of squared distances to
    the centroid, in original embedding units). Fully declarative —
    centroid state never leaves the cluster (no driver collect)."""
    q = _qframe(spark, sf_dir)
    first = q.select(F.size("qx").alias("dim")).first()  # 1-value contract check
    if first is None or first["dim"] != _DIM:
        raise ValueError(f"expected dim {_DIM} embeddings in {sf_dir}")
    cent = (
        q.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1)
            .cast("long")
            .alias("cluster_id"),
            F.col("qx").alias("s"),
            F.lit(1).cast("long").alias("c"),
        )
        .localCheckpoint()
    )
    for _ in range(iters):
        cent = _next_centroids(_with_assignment(q, _pack_centroids(cent)), cent)

    # Final assignment + per-cluster stats. Full distance restores the
    # ‖x‖² term: (c²·‖x‖² − 2c·⟨x,s⟩ + ‖s‖²) / (c²·SCALE²).
    assigned = _with_assignment(q, _pack_centroids(cent))
    scale2 = F.lit(KMEANS_SCALE * KMEANS_SCALE)

    def full_d(ct: Column) -> Column:
        num = (
            ct["c"] * ct["c"] * F.col("n2x")
            - F.lit(2).cast("long") * ct["c"] * _dot_ct(ct)
            + ct["s2"]
        )
        return num.cast("double") / (ct["c"] * ct["c"] * scale2).cast("double")

    dist = F.aggregate(
        F.col("cents"),
        F.lit(0.0),
        lambda acc, ct: F.when(
            ct["cluster_id"] == F.col("cluster_id"), full_d(ct)
        ).otherwise(acc),
    )
    return (
        assigned.withColumn("dist", dist)
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n_vecs"), F.sum("dist").alias("inertia"))
    )


# ------------------------------------------------------------- SQL twin

def _sql_dot(vec_a: str, vec_b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {_DIM}),"
        f" i -> {vec_a}[i] * {vec_b}[i]))"
    )


def kmeans_sql(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    """DuckDB twin: the same iterations unrolled as CTEs. Centroid state
    is computed relationally (per-dim sums via dim-unnest + list(ORDER
    BY i)) — exact integers, so every assignment matches the Spark side
    bit-for-bit."""
    s2 = f"list_sum(list_transform(s, v -> v * v))"
    d = (
        f"CAST({s2} - 2 * c * {_sql_dot('qx', 's')} AS DOUBLE)"
        f" / CAST(c * c AS DOUBLE)"
    )
    parts = [
        f"""kq AS (
    SELECT vec_id,
        list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(ROUND(x * {KMEANS_SCALE}) AS BIGINT)) AS qx
    FROM embeddings
),
kq2 AS (
    SELECT vec_id, qx,
        list_sum(list_transform(qx, v -> v * v)) AS n2x
    FROM kq
),
c0 AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT)
            AS cluster_id,
        qx AS s, CAST(1 AS BIGINT) AS c
    FROM kq2 QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= {k}
)"""
    ]
    for it in range(1, iters + 1):
        prev, cur = f"c{it - 1}", f"c{it}"
        parts.append(
            f"""a{it} AS (
    SELECT vec_id, qx, cluster_id
    FROM (
        SELECT kq2.vec_id, kq2.qx, {prev}.cluster_id,
            ROW_NUMBER() OVER (
                PARTITION BY kq2.vec_id
                ORDER BY {d}, {prev}.cluster_id
            ) AS rn
        FROM kq2 CROSS JOIN {prev}
    ) r WHERE rn = 1
),
{cur}_new AS (
    SELECT cluster_id,
        list(dim_sum ORDER BY i) AS s,
        MIN(cnt) AS c
    FROM (
        SELECT a.cluster_id, d.i,
            SUM(a.qx[d.i]) AS dim_sum,
            COUNT(*) AS cnt
        FROM a{it} a
        CROSS JOIN (SELECT UNNEST(generate_series(1, {_DIM})) AS i) d
        GROUP BY a.cluster_id, d.i
    ) g GROUP BY cluster_id
),
{cur} AS (
    SELECT p.cluster_id,
        COALESCE(n.s, p.s) AS s,
        CAST(COALESCE(n.c, p.c) AS BIGINT) AS c
    FROM {prev} p LEFT JOIN {cur}_new n ON p.cluster_id = n.cluster_id
)"""
        )
    last = f"c{iters}"
    full_d = (
        f"CAST(c * c * n2x - 2 * c * {_sql_dot('qx', 's')} + {s2} AS DOUBLE)"
        f" / CAST(c * c * {KMEANS_SCALE * KMEANS_SCALE} AS DOUBLE)"
    )
    final = f"""kfinal AS (
    SELECT vec_id, cluster_id, dist
    FROM (
        SELECT kq2.vec_id, {last}.cluster_id, {full_d} AS dist,
            ROW_NUMBER() OVER (
                PARTITION BY kq2.vec_id
                ORDER BY {d}, {last}.cluster_id
            ) AS rn
        FROM kq2 CROSS JOIN {last}
    ) r WHERE rn = 1
)"""
    parts.append(final)
    body = ",\n".join(parts)
    return f"""(
    WITH {body}
    SELECT cluster_id, COUNT(*) AS n_vecs, SUM(dist) AS inertia
    FROM kfinal
    GROUP BY cluster_id
) km"""
