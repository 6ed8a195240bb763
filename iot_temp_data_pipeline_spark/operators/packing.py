"""Training-batch assembly operators (beyond-reference surface):
sequence packing into fixed-length contexts and temperature-based
language resampling weights — the last mile between a cleaned corpus
and a training dataloader.

Both are single-pass window/aggregate plans (no UDFs, no shuffles beyond
the stated keys), with bit-exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count

CONTEXT_LEN = 512
# docs longer than the context are truncated to it (the standard packing
# simplification; long-doc splitting is a separate chunking op)
ALPHA = 0.5  # temperature exponent for language re-sampling


def pack_sequences(docs: DataFrame, context_len: int = CONTEXT_LEN) -> DataFrame:
    """Grid sequence packing: documents (ordered by doc_id —
    deterministic, reproducible batches) are laid head-to-tail on a
    token line; the line is cut into a fixed ``context_len`` grid, and
    each document is assigned to the grid cell it ENDS in (docs are
    clipped to context_len, so a doc spans at most two cells). Documents
    fully inside a cell keep their line offset; boundary-crossing docs
    re-anchor at offset 0 of their end cell.

    This is the parallel-friendly variant of greedy next-fit packing:
    true next-fit is a sequential scan (each break depends on all prior
    breaks — not expressible as a window function), while the grid
    assignment depends only on the global prefix sum, so it is ONE
    ordered-window pass and embarrassingly parallel. The trade is
    bounded slack: at most one crossing doc per cell re-anchors, leaving
    ≤ clip-length waste per bin — the same per-bin padding budget a
    next-fit loader tolerates. At 100 TB you'd key the window by
    dataloader shard (doc_id range) and pack shards independently; the
    plan is identical with a partitioned window.

    Output: (doc_id, n_tokens [clipped], bin_id, offset_in_bin).
    """
    n_raw = token_count(F.col("text"))
    toks = F.least(n_raw, F.lit(context_len)).alias("n_tokens")
    d = docs.select("doc_id", toks)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    pre = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    first_grid = (pre / context_len).cast("long")
    last_grid = ((pre + F.col("n_tokens") - 1) / context_len).cast("long")
    crosses = first_grid != last_grid
    # grid packing: a crossing doc is assigned to the grid cell it ends
    # in; offset_in_bin is position within its cell on the virtual line
    bin_id = F.when(crosses, last_grid).otherwise(first_grid)
    offset = F.when(crosses, F.lit(0)).otherwise(pre - first_grid * context_len)
    return d.select(
        "doc_id",
        "n_tokens",
        bin_id.alias("bin_id"),
        offset.cast("long").alias("offset_in_bin"),
    )


def pack_sequences_sql(source: str = "documents", context_len: int = CONTEXT_LEN) -> str:
    return f"""(
    WITH pd AS (
        SELECT doc_id,
            LEAST(len(regexp_split_to_array(lower(text), '\\s+')),
                  {context_len}) AS n_tokens
        FROM {source}
    ),
    pp AS (
        SELECT doc_id, n_tokens,
            COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
        FROM pd
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        CAST(CASE WHEN pre // {context_len}
                       <> (pre + n_tokens - 1) // {context_len}
                  THEN (pre + n_tokens - 1) // {context_len}
                  ELSE pre // {context_len} END AS BIGINT) AS bin_id,
        CAST(CASE WHEN pre // {context_len}
                       <> (pre + n_tokens - 1) // {context_len}
                  THEN 0
                  ELSE pre - (pre // {context_len}) * {context_len}
             END AS BIGINT) AS offset_in_bin
    FROM pp
) pk"""


def language_sampling_weights(docs: DataFrame, alpha: float = ALPHA) -> DataFrame:
    """Temperature-based language re-sampling (the multilingual-corpus
    balancing rule published with XLM-R and mT5): sample language l with
    probability p_l ∝ (n_l / N)^α, α < 1 up-weighting low-resource
    languages. Output per language: doc count, natural share, resampled
    share, and the per-document sampling weight (resampled share /
    natural share — the rate a dataloader over-/under-samples each doc).

    One tiny aggregate + a 1-row cross join; the per-doc weight column
    broadcast-joins back onto the corpus at scale.
    """
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("n_total"))
    scored = counts.crossJoin(F.broadcast(total)).select(
        "lang",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("n_total").cast("double")).alias(
            "natural_share"
        ),
        F.pow(
            F.col("n_docs").cast("double") / F.col("n_total").cast("double"),
            F.lit(alpha),
        ).alias("p_alpha"),
    )
    z = scored.agg(F.sum("p_alpha").alias("z"))
    return scored.crossJoin(F.broadcast(z)).select(
        "lang",
        "n_docs",
        "natural_share",
        (F.col("p_alpha") / F.col("z")).alias("resampled_share"),
        ((F.col("p_alpha") / F.col("z")) / F.col("natural_share")).alias(
            "doc_weight"
        ),
    )


def language_sampling_weights_sql(source: str = "documents", alpha: float = ALPHA) -> str:
    share = "CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE)"
    return f"""(
    WITH lc AS (
        SELECT lang, COUNT(*) AS n_docs FROM {source} GROUP BY lang
    ),
    lt AS (SELECT SUM(n_docs) AS n_total FROM lc),
    ls AS (
        SELECT lang, n_docs,
            {share} AS natural_share,
            POW({share}, {alpha}) AS p_alpha
        FROM lc CROSS JOIN lt
    ),
    lz AS (SELECT SUM(p_alpha) AS z FROM ls)
    SELECT lang, n_docs, natural_share,
        p_alpha / z AS resampled_share,
        (p_alpha / z) / natural_share AS doc_weight
    FROM ls CROSS JOIN lz
) lw"""
