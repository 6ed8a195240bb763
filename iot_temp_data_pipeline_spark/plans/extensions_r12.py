"""Round-12 query specs: the independently-timed ANN index-BUILD row
(VERDICT r11 "what's wrong" #1 / next-round #6). The IVF-SQ8 serve rows
read the session-cached inverted-list artifact (sq8.ivfsq8_enc_index,
built untimed by warm-ups); this row measures the BUILD itself, from
the parquet, bypassing every session cache — quantize + norm the
embedding table, SQ8-encode, assign each vector to its argmax-cosine
coarse cell, and join codes with placements into the inverted-list
layout. The oracle recomputes the identical build in DuckDB; the code
array is pinned through an exact integer position-weighted checksum
(Σ i·code_i over 1-based positions — both engines compute it over
exact int64 codes), so any code byte or placement drift flips the row
hash."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sq8 as sq
from ..operators.similarity import (
    ADAPTIVE_MOD_SQL,
    MATMUL_ASSIGN_MIN_N,
    QUANT_SQL,
    _with_quantized,
    adaptive_centroid_mod,
    ivf_cell_assignments,
    ivf_cell_assignments_matmul,
    sql_qcos,
)
from ..sources.catalog import load_table
from .registry import ColSpec, QuerySpec, shape, sql_select

EXTENSIONS_R12: dict[str, QuerySpec] = {}


IVFSQ8_BUILD_SPEC: ColSpec = [
    ("vec_id", "long"),
    ("cell_id", "long"),
    ("m", "long"),
    ("qnorm2", "long"),
    ("code_checksum", "long"),
]


def _ivfsq8_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From-scratch IVF-SQ8 inverted-list build (NO session caches —
    the serve rows' warm-up artifact cost, now on the record): one
    quantize+norm pass over the embeddings parquet, the SQ8 encode
    map pass, the O(N·C) coarse assignment (same cost-based
    hof/matmul strategy split as the cached build), and the
    codes⋈placements join. Output one row per encoded vector with the
    exact position-weighted code checksum."""
    emb = _with_quantized(load_table(spark, sf_dir, "embeddings"))
    n = load_table(spark, sf_dir, "embeddings").count()
    centroid_mod = adaptive_centroid_mod(n)
    assigner = (
        ivf_cell_assignments_matmul
        if n >= MATMUL_ASSIGN_MIN_N
        else ivf_cell_assignments
    )
    assigned, _cent = assigner(emb, centroid_mod)
    codes = sq.sq8_encode(emb)
    enc = codes.join(assigned.select("vec_id", "cell_id"), "vec_id")
    checksum = F.expr(
        "aggregate(zip_with(code, sequence(1, size(code)), (c, i) -> c * i),"
        " 0L, (acc, x) -> acc + x)"
    )
    return shape(
        enc.select(
            "vec_id", "cell_id", "m", "qnorm2", checksum.alias("code_checksum")
        ),
        IVFSQ8_BUILD_SPEC,
    )


_ASSIGN_COS = sql_qcos("b.qvec", "a.qvec", "b.qnorm2", "a.qnorm2")

IVFSQ8_BUILD_ORACLE = (
    "WITH "
    + QUANT_SQL.strip()
    + ",\n"
    + sq.SQ8_CTE_SQL.strip()
    + sql_select(
        IVFSQ8_BUILD_SPEC,
        f"""(
    WITH ib_centroids AS (
        SELECT vec_id AS cell_id, qvec, qnorm2 FROM qnormed
        WHERE vec_id % {ADAPTIVE_MOD_SQL} = 0
    ),
    ib_scored AS (
        SELECT b.vec_id, a.cell_id, {_ASSIGN_COS} AS c_cos
        FROM qnormed b CROSS JOIN ib_centroids a
    ),
    ib_assigned AS (
        SELECT vec_id, cell_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY c_cos DESC, cell_id) AS rn
            FROM ib_scored
        ) t WHERE rn = 1
    )
    SELECT c.vec_id, a.cell_id, c.m, c.qnorm2,
        list_sum(list_transform(generate_series(1, len(c.code)),
                 i -> c.code[i] * i)) AS code_checksum
    FROM sq8codes c JOIN ib_assigned a USING (vec_id)
) ib""",
    )
)

EXTENSIONS_R12["ivfsq8_index_build"] = QuerySpec(
    _ivfsq8_index_build, IVFSQ8_BUILD_ORACLE
)
