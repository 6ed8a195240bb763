"""Integer-arithmetic PageRank over the near-duplicate graph
(beyond-reference surface): importance scoring of documents inside
their duplicate/similarity clusters — the signal used to pick cluster
canonicals ("keep the most-linked version") and to weight crawl dups.

Iterative float PageRank cannot be oracle-checked across engines
(per-node incoming sums are order-dependent doubles). This version runs
entirely in fixed-point integers: ranks carry RANK_SCALE units, each
iteration distributes ``r div deg`` (exact integer division) along
edges, damps with the exact rational 85/100, and truncates identically
in both engines — so every iteration is bit-reproducible anywhere.
Truncation loses ≤ deg units of mass per node per round (bounded,
deterministic); scores are reported in RANK_SCALE units.

Execution shape: per iteration one groupBy(dst) SUM over the edge list
(map-side combined) joined back to the node table — the standard
distributed PageRank step; ``localCheckpoint`` truncates lineage. At
100 TB the edge list is hash-partitioned by dst and the node table
co-partitioned, so each round is one co-located shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 1_000_000
PR_ITERS = 3
DAMP_NUM, DAMP_DEN = 85, 100


def _idiv(a, b):
    """Exact integer division (Spark SQL ``div`` — long-safe at any
    magnitude, unlike float division + floor)."""
    return F.expr(f"{a} div {b}")


def pagerank_int(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    iters: int = PR_ITERS,
) -> DataFrame:
    """Fixed-point PageRank on the undirected graph of ``edges``.

    Returns (doc_id, degree, rank_e6) where rank_e6 is the damped rank
    after ``iters`` rounds in RANK_SCALE units (init = RANK_SCALE each).
    """
    sym = (
        edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = sym.unionByName(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count("*").alias("degree"))
    nodes = deg.withColumn(
        "rank", F.lit(RANK_SCALE).cast("long")
    ).localCheckpoint()
    base = RANK_SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN  # (1-d)·scale, exact
    for _ in range(iters):
        contrib = (
            sym.join(nodes, "u")
            .select(F.col("v").alias("u"), _idiv("rank", "degree").alias("c"))
            .groupBy("u")
            .agg(F.sum("c").alias("inflow"))
        )
        nodes = (
            nodes.drop("rank")
            .join(contrib, "u", "left")
            .select(
                "u",
                "degree",
                (
                    F.lit(base)
                    + _idiv(
                        f"{DAMP_NUM} * coalesce(inflow, 0L)", str(DAMP_DEN)
                    )
                ).cast("long").alias("rank"),
            )
            .localCheckpoint()
        )
    return nodes.select(
        F.col("u").alias("doc_id"), "degree", F.col("rank").alias("rank_e6")
    )


def pagerank_int_sql(
    edges_relation: str,
    src: str = "doc_a",
    dst: str = "doc_b",
    iters: int = PR_ITERS,
) -> str:
    """DuckDB twin: identical integer recurrence, iterations unrolled."""
    base = RANK_SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    parts = [
        f"""gsym AS (
    SELECT u, v FROM (
        SELECT CAST({src} AS BIGINT) AS u, CAST({dst} AS BIGINT) AS v
        FROM {edges_relation} WHERE {src} <> {dst}
        UNION
        SELECT CAST({dst} AS BIGINT) AS u, CAST({src} AS BIGINT) AS v
        FROM {edges_relation} WHERE {src} <> {dst}
    ) e
),
gn0 AS (
    SELECT u, COUNT(*) AS degree, CAST({RANK_SCALE} AS BIGINT) AS rank
    FROM gsym GROUP BY u
)"""
    ]
    for it in range(1, iters + 1):
        prev, cur = f"gn{it - 1}", f"gn{it}"
        parts.append(
            f"""{cur} AS (
    SELECT p.u, p.degree,
        CAST({base} + ({DAMP_NUM} * COALESCE(f.inflow, 0)) // {DAMP_DEN}
             AS BIGINT) AS rank
    FROM {prev} p
    LEFT JOIN (
        SELECT gsym.v AS u, SUM(p2.rank // p2.degree) AS inflow
        FROM gsym JOIN {prev} p2 ON gsym.u = p2.u
        GROUP BY gsym.v
    ) f ON p.u = f.u
)"""
        )
    body = ",\n".join(parts)
    return f"""(
    WITH {body}
    SELECT u AS doc_id, degree, rank AS rank_e6 FROM gn{iters}
) pr"""
