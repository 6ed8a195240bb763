"""Content-defined document chunking (beyond-reference surface).

Splits each document into variable-length chunks whose boundaries are
chosen by token content (a token is a cut point iff its portable hash
≡ 0 mod ``CHUNK_MOD``) — the content-defined-chunking idea behind
storage dedup and RAG chunkers: an insertion early in a document only
shifts ONE chunk's boundary, not every subsequent fixed-size window,
so chunk hashes stay stable under local edits and downstream chunk-level
dedup keeps matching.

Entirely per-row array expressions (filter/transform/slice over the
token array) + one explode — no shuffle at all until a consumer
aggregates; embarrassingly parallel at any corpus size. Expected chunk
length = CHUNK_MOD tokens, bounded above by MAX_CHUNK (a forced cut —
the standard CDC max-window guard against pathological content).

The DuckDB twin reproduces every boundary bit-for-bit (md5-derived
hashes, functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash32, portable_hash32_sql
from ..functions.text import tokens

CHUNK_MOD = 16  # expected chunk length in tokens
MAX_CHUNK = 64  # forced-cut upper bound
CHUNK_SEED = 5


def _is_cut(tok: Column) -> Column:
    return portable_hash32(tok, seed=CHUNK_SEED) % CHUNK_MOD == 0


def chunk_documents(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_idx, start_tok, n_tokens, chunk_hash) — one row
    per chunk. A cut closes the chunk AFTER the cut token; chunks
    longer than MAX_CHUNK are force-cut."""
    d = docs.select("doc_id", tokens(F.col("text")).alias("tk"))
    n = F.size("tk")
    # natural cut positions (1-based, inclusive chunk ends)
    cuts = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: _is_cut(F.element_at(F.col("tk"), i)),
    )
    # add the document end as a final cut; dedupe keeps it single
    cuts = F.array_distinct(F.concat(cuts, F.array(n)))
    # enforce MAX_CHUNK: between consecutive cuts insert forced cuts.
    # aggregate over the cut list, carrying (prev_end, out_list).
    def _expand(acc, c):
        prev = acc.getField("prev")
        out = acc.getField("out")
        # forced cut points between prev and c at MAX_CHUNK strides.
        # Guard the sequence: Spark's sequence(1, 0) counts DOWN instead
        # of returning empty (same pitfall as functions/text.py).
        n_forced = F.floor((c - prev - 1) / MAX_CHUNK).cast("int")
        forced = F.when(
            n_forced >= 1,
            F.transform(
                F.sequence(F.lit(1), n_forced), lambda j: prev + j * MAX_CHUNK
            ),
        ).otherwise(F.array().cast("array<int>"))
        return F.struct(
            c.alias("prev"),
            F.concat(out, forced, F.array(c)).alias("out"),
        )

    all_cuts = F.aggregate(
        cuts,
        F.struct(
            F.lit(0).cast("int").alias("prev"),
            F.array().cast("array<int>").alias("out"),
        ),
        _expand,
        lambda acc: acc.getField("out"),
    )
    with_cuts = d.withColumn("cuts", all_cuts).filter(n > 0)
    # chunk i spans (cuts[i-1], cuts[i]]
    chunk = F.transform(
        F.sequence(F.lit(1), F.size("cuts")),
        lambda i: F.struct(
            (i - 1).cast("long").alias("chunk_idx"),
            # element_at(_, 0) raises INVALID_INDEX_OF_ZERO under ANSI —
            # branch instead of coalesce for the first chunk
            F.when(i == 1, F.lit(0))
            .otherwise(F.element_at(F.col("cuts"), (i - 1).cast("int")))
            .alias("start0"),
            F.element_at(F.col("cuts"), i.cast("int")).alias("end1"),
        ),
    )
    exploded = with_cuts.select(
        "doc_id", "tk", F.explode(chunk).alias("c")
    ).select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        (F.col("c.start0") + 1).cast("long").alias("start_tok"),
        (F.col("c.end1") - F.col("c.start0")).cast("long").alias("n_tokens"),
        F.md5(
            F.array_join(
                F.slice(
                    F.col("tk"),
                    F.col("c.start0") + 1,
                    F.col("c.end1") - F.col("c.start0"),
                ),
                " ",
            )
        ).alias("chunk_hash"),
    )
    return exploded.filter(F.col("n_tokens") > 0)


MAX_CHUNK_DF = 200  # hot-chunk prune cap (same rationale as MAX_SHINGLE_DF)
MIN_COMMON_CHUNKS = 2


def chunk_overlap_pairs(
    docs: DataFrame,
    max_chunk_df: int = MAX_CHUNK_DF,
    min_common: int = MIN_COMMON_CHUNKS,
) -> DataFrame:
    """Near-duplicate pairs by shared content-defined chunks — the
    storage-dedup view of similarity: docs sharing ≥ ``min_common``
    chunk hashes overlap in actual content runs, robust to head/tail
    edits (unlike fixed windows). Same scale shape as the shingle
    self-join: hot chunks (> max_chunk_df docs) are pruned with a count
    window over the join's own shuffle, bounding candidate fan-out."""
    ch = (
        chunk_documents(docs)
        .select("doc_id", "chunk_hash")
        .distinct()
        .withColumn(
            "df", F.count("*").over(Window.partitionBy("chunk_hash"))
        )
        .filter(F.col("df") <= max_chunk_df)
        .drop("df")
    )
    a, b = ch.alias("a"), ch.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_hash") == F.col("b.chunk_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("common_chunks"))
        .filter(F.col("common_chunks") >= min_common)
    )


def chunk_overlap_pairs_sql(
    source: str = "corpus",
    max_chunk_df: int = MAX_CHUNK_DF,
    min_common: int = MIN_COMMON_CHUNKS,
) -> str:
    return f"""(
    WITH och AS (
        SELECT DISTINCT doc_id, chunk_hash
        FROM {chunk_documents_sql(source)}
    ),
    opr AS (
        SELECT doc_id, chunk_hash FROM (
            SELECT doc_id, chunk_hash,
                COUNT(*) OVER (PARTITION BY chunk_hash) AS df
            FROM och
        ) t WHERE df <= {max_chunk_df}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common_chunks
    FROM opr a JOIN opr b
      ON a.chunk_hash = b.chunk_hash AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= {min_common}
) ov"""


def chunk_documents_sql(source: str = "documents") -> str:
    h = portable_hash32_sql("tk[i]", seed=CHUNK_SEED)
    return f"""(
    WITH ct AS (
        SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS tk
        FROM {source}
    ),
    cnat AS (
        SELECT doc_id, tk,
            list_sort(list_distinct(list_append(
                list_filter(generate_series(1, len(tk)),
                            i -> ({h}) % {CHUNK_MOD} = 0),
                len(tk)))) AS cuts
        FROM ct WHERE len(tk) > 0
    ),
    call AS (
        SELECT doc_id, tk,
            list_reduce(
                list_prepend([0], list_transform(cuts, c -> [c])),
                (acc, cl) -> list_concat(
                    acc,
                    list_concat(
                        list_transform(
                            generate_series(1,
                                ((cl[1] - acc[len(acc)] - 1) // {MAX_CHUNK})::INT),
                            j -> acc[len(acc)] + j * {MAX_CHUNK}),
                        cl))
            ) AS cuts0
        FROM cnat
    ),
    chunks AS (
        SELECT doc_id, tk, cuts0,
            unnest(generate_series(2, len(cuts0))) AS ci
        FROM call
    )
    SELECT doc_id,
        CAST(ci - 2 AS BIGINT) AS chunk_idx,
        CAST(cuts0[ci - 1] + 1 AS BIGINT) AS start_tok,
        CAST(cuts0[ci] - cuts0[ci - 1] AS BIGINT) AS n_tokens,
        md5(array_to_string(tk[cuts0[ci - 1] + 1 : cuts0[ci]], ' ')) AS chunk_hash
    FROM chunks
    WHERE cuts0[ci] - cuts0[ci - 1] > 0
) ch"""
