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

Execution shape: the symmetrized edge list is hash-partitioned by
``u`` ONCE (with per-source degree folded in) and persisted; every
iteration then reuses that exchange, so a round is exactly one shuffle
(the groupBy(dst) contribution sum, map-side combined) — the rank
table arrives pre-partitioned on ``u`` from the previous round's
aggregation, and in a symmetric graph every node receives inflow, so
no join-back against the node table is needed at all.
``localCheckpoint`` truncates lineage while preserving partitioning.
At 100 TB this is the scale-correct plan: edge-list partitioning is
paid once, per-iteration cost is a single co-located shuffle of
node-sized contributions.
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

    Edges are canonicalized (u < v) and set-deduplicated BEFORE
    symmetrizing, so inputs containing both (a,b) and (b,a) count each
    undirected edge once — matching the SQL twin's UNION set semantics
    regardless of input orientation.
    """
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).filter(F.col("u") != F.col("v"))
    canon = e.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    ).distinct()
    # one partitioning of the edge list, reused by every iteration
    sym = (
        canon.unionByName(canon.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .repartition("u")
        .persist()
    )
    # checkpointed (one small row per node) so the returned plan does
    # not depend on the sym/edeg caches, which are dropped below
    deg = sym.groupBy("u").agg(F.count("*").alias("degree")).localCheckpoint()
    # fold out-degree into the edge table once: both sides of this join
    # are already hash-partitioned on u, so no exchange is introduced
    edeg = sym.join(deg, "u").persist()
    ranks = deg.select(
        "u", F.lit(RANK_SCALE).cast("long").alias("rank")
    ).localCheckpoint()
    base = RANK_SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN  # (1-d)·scale, exact
    for _ in range(iters):
        # ranks is partitioned on u (groupBy output / initial deg), edeg is
        # persisted partitioned on u → the join is exchange-free; the only
        # shuffle per round is the contribution sum, and in a symmetric
        # graph every node has inflow so the result covers all nodes.
        ranks = (
            edeg.join(ranks, "u")
            .select(F.col("v").alias("u"), _idiv("rank", "degree").alias("c"))
            .groupBy("u")
            .agg(
                (
                    F.lit(base) + _idiv(f"{DAMP_NUM} * sum(c)", str(DAMP_DEN))
                ).cast("long").alias("rank")
            )
            .localCheckpoint()
        )
    # iterations are done and deg/ranks are checkpointed — release the
    # edge caches so repeated calls don't accumulate executor memory
    edeg.unpersist()
    sym.unpersist()
    return deg.join(ranks, "u").select(
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


def triangle_count(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Per-node triangle counts on the undirected near-dup graph — the
    classic density signal: triangle-rich duplicate clusters are
    boilerplate families (every page links every page); triangle-free
    chains are revision histories. Distinct machinery from CC/PageRank:
    the node-iterator join with DEGREE-ORDERED edge orientation
    (Schank–Wagner / Suri–Vassilvitskii MapReduce form, public
    algorithm), which bounds the wedge-join fan-out by the arboricity —
    each edge is oriented low-degree → high-degree (ties by id), so no
    node enumerates more wedges than its oriented out-degree², keeping
    skewed hubs from exploding the join at 100 TB.

    Two shuffles total: one degree aggregate, one wedge self-join whose
    probe side is the oriented (thus bounded) edge list."""
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        # Materialize the canonical edge list ONCE. It fans out into
        # sym/deg/oriented/wedges/closing-edge — six consumers — and
        # upstream edge GENERATION (e.g. the n-gram Jaccard pipeline)
        # is far heavier than the edges themselves; without this the
        # lineage re-runs it per consumer (measured 14 s -> ~2 s at
        # sf0.1). Same localCheckpoint pattern as the CC iterations.
        .localCheckpoint()
    )
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count("*").alias("d"))
    # orient each undirected edge from the lower-(degree, id) endpoint
    # to the higher one
    oriented = (
        sym.join(deg, "u")
        .join(
            deg.select(F.col("u").alias("v"), F.col("d").alias("dv")),
            "v",
        )
        .filter(
            (F.col("d") < F.col("dv"))
            | ((F.col("d") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v")
    )
    # wedges: two oriented edges out of the same pivot; the closing
    # edge check runs against the canonical undirected edge list
    wedges = (
        oriented.alias("a")
        .join(oriented.alias("b"), F.col("a.u") == F.col("b.u"))
        .filter(F.col("a.v") < F.col("b.v"))
        .select(
            F.col("a.u").alias("pivot"),
            F.col("a.v").alias("x"),
            F.col("b.v").alias("y"),
        )
    )
    tri = wedges.join(
        e.select(F.col("u").alias("x"), F.col("v").alias("y")), ["x", "y"]
    )
    per_node = (
        tri.select(F.explode(F.array("pivot", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    return per_node.orderBy("node")


def triangle_count_sql(edges_cte: str = "pairs") -> str:
    """DuckDB twin over a CTE named ``edges_cte`` with doc_a/doc_b
    columns. Independent algorithm: brute-force closed-wedge counting
    over the canonical edge list (no degree orientation) — different
    plan, same counts, which is exactly what an oracle should be."""
    return f"""(
    WITH tc_e AS (
        SELECT DISTINCT LEAST(doc_a, doc_b) AS u, GREATEST(doc_a, doc_b) AS v
        FROM {edges_cte} WHERE doc_a <> doc_b
    ),
    tc_tri AS (
        SELECT a.u AS n1, a.v AS n2, b.v AS n3
        FROM tc_e a
        JOIN tc_e b ON b.u = a.v
        JOIN tc_e c ON c.u = a.u AND c.v = b.v
    )
    SELECT node, COUNT(*) AS n_triangles FROM (
        SELECT n1 AS node FROM tc_tri
        UNION ALL SELECT n2 FROM tc_tri
        UNION ALL SELECT n3 FROM tc_tri
    )
    GROUP BY node
    ORDER BY node
) tc"""
