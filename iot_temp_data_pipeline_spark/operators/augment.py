"""Training-example construction transforms (beyond-reference surface):
the deterministic per-document rewrites an LLM data pipeline applies
between curation and batching — T5-style span corruption planning and
FIM (fill-in-the-middle) document splitting.

Both are PURE PER-ROW array/hash expressions: zero shuffles, zero
Python, whole-stage codegen end to end — the ideal 100 TB shape (the
transform cost is one scan, trivially parallel). Randomness is the
repo's portable md5 hash of (doc_id, position), so the "random" plans
are bit-reproducible in DuckDB and stable across reruns/retries —
exactly how production pipelines make example construction
deterministic (seeded by example id, never by RNG state).

Cited public designs: span corruption is the T5 denoising objective
(Raffel et al., JMLR 2020 — corrupt ~15% of tokens in contiguous
spans, mean length 3); FIM is the prefix/suffix/middle rearrangement
objective (Bavarian et al., arXiv:2207.14255 — split at two random
cut points, PSM/SPM modes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash32, portable_hash32_sql
from ..functions.text import tokens

# T5 defaults: 15% corruption rate, mean span length 3 → a span STARTS
# at position i with probability rate/mean_len (5%), and runs 3 tokens.
CORRUPT_START_PCT = 5
CORRUPT_SPAN_LEN = 3
CORRUPT_SEED = 41

FIM_SEED = 43


def _pos_hash(prefix: int, i):
    """Portable hash of (doc_id, position) — the deterministic coin for
    position ``i`` (a lambda Column) of the current row's doc."""
    return portable_hash32(
        F.concat(
            F.col("doc_id").cast("string"), F.lit(":"), i.cast("string")
        ),
        seed=prefix,
    )


def span_corruption_plan(docs: DataFrame) -> DataFrame:
    """Per-document T5 span-corruption PLAN: which token positions the
    denoising objective masks, derived from the deterministic position
    hash — a span of CORRUPT_SPAN_LEN tokens starts wherever
    hash(doc, i) % 100 < CORRUPT_START_PCT (≈15% of tokens corrupted in
    mean-3 spans, the published objective). Emits the audit row a
    pipeline materializes: token counts, span count (distinct sentinel
    tokens the encoder sees), corrupted-token count/ppm, and md5s of
    the kept and corrupted token sequences (pinning the REWRITE, not
    just the counts).

    Span semantics: position i is corrupted iff some start s ∈
    (i−L, i] fired; a SPAN (one sentinel) begins at i iff i is
    corrupted and i−1 is not. Overlapping starts merge — exactly the
    contiguous-span merge of the reference implementation."""
    n = F.size(F.col("tk"))
    idx = F.sequence(F.lit(0), n - 1)

    def fired(i):
        return _pos_hash(CORRUPT_SEED, i) % 100 < CORRUPT_START_PCT

    # Bind the per-position coin ONCE as a boolean array, then derive
    # the merged-corruption mask from it by array indexing: the md5
    # cost is exactly n digests per doc. CRITICAL plan detail: the
    # derivation references the bound `fired` column CORRUPT_SPAN_LEN
    # times (the window unrolled into explicit element_at terms), so
    # CollapseProject's duplicate-expensive-expression guard keeps the
    # array materialized per row instead of inlining its construction
    # into the lambda — a single-reference form (exists over a
    # sequence) WAS inlined and re-built the md5 array PER ELEMENT:
    # O(n²) digests, measured 47 s at sf0.1 vs ~0.6 s for this form
    # (the repetition_quality g5-binding precedent, one level deeper).
    def corr_at(i):
        # corrupted(i) ⇔ fired(i) ∨ fired(i−1) ∨ … ∨ fired(i−L+1)
        out = F.element_at(F.col("fired"), i + 1)
        for j in range(1, CORRUPT_SPAN_LEN):
            out = out | (
                (i >= j)
                & F.element_at(F.col("fired"), F.greatest(i + 1 - j, F.lit(1)))
            )
        return out

    kept = F.filter(
        F.col("tk"), lambda _t, i: ~F.element_at(F.col("corr"), i + 1)
    )
    cut = F.filter(
        F.col("tk"), lambda _t, i: F.element_at(F.col("corr"), i + 1)
    )
    n_spans = F.size(
        F.filter(
            idx,
            lambda i: F.element_at(F.col("corr"), i + 1)
            & ((i == 0) | ~F.element_at(F.col("corr"), F.greatest(i, F.lit(1)))),
        )
    )
    return (
        docs.select("doc_id", tokens(F.col("text")).alias("tk"))
        .withColumn("fired", F.transform(idx, fired))
        .withColumn("corr", F.transform(idx, corr_at))
        .withColumn("n_spans_c", n_spans)
        .select(
            "doc_id",
            F.size("tk").cast("long").alias("n_tokens"),
            F.size(F.filter("corr", lambda c: c)).cast("long").alias("n_corrupted"),
            F.col("n_spans_c").cast("long").alias("n_spans"),
            F.expr(
                "div(1000000 * size(filter(corr, c -> c)), greatest(size(tk), 1))"
            ).alias("corruption_ppm"),
            F.md5(F.array_join(kept, " ")).alias("kept_md5"),
            F.md5(F.array_join(cut, " ")).alias("corrupted_md5"),
        )
    )


def span_corruption_plan_sql(source: str = "corpus_or_documents") -> str:
    h = portable_hash32_sql(
        f"CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)",
        seed=CORRUPT_SEED,
    )
    fired = f"({h}) % 100 < {CORRUPT_START_PCT}"
    # DuckDB lambdas: corrupted(i) tested by expanding the covering
    # window explicitly (the same ∃ start ∈ (i−L, i])
    cover = " OR ".join(
        f"(i >= {j} AND ({h.replace('CAST(i AS VARCHAR)', f'CAST(i - {j} AS VARCHAR)')}) % 100 < {CORRUPT_START_PCT})"
        if j
        else fired
        for j in range(CORRUPT_SPAN_LEN)
    )
    return f"""(
    WITH sc_tk AS (
        SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS tk
        FROM {source}
    ),
    sc_pos AS (
        SELECT doc_id, tk, i - 1 AS i
        FROM sc_tk, unnest(generate_series(1, len(tk))) AS u(i)
    ),
    sc_flag AS (
        SELECT doc_id, tk, i, ({cover}) AS corrupted
        FROM sc_pos
    ),
    sc_prev AS (
        SELECT *, COALESCE(LAG(corrupted) OVER (
            PARTITION BY doc_id ORDER BY i), FALSE) AS prev_corrupted
        FROM sc_flag
    ),
    sc_doc AS (
        SELECT doc_id,
            COUNT(*) AS n_tokens,
            SUM(CASE WHEN corrupted THEN 1 ELSE 0 END) AS n_corrupted,
            SUM(CASE WHEN corrupted AND NOT prev_corrupted
                THEN 1 ELSE 0 END) AS n_spans,
            string_agg(CASE WHEN NOT corrupted THEN tk[i + 1] END, ' '
                       ORDER BY i) AS kept_txt,
            string_agg(CASE WHEN corrupted THEN tk[i + 1] END, ' '
                       ORDER BY i) AS cut_txt
        FROM sc_prev
        GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        CAST(n_corrupted AS BIGINT) AS n_corrupted,
        CAST(n_spans AS BIGINT) AS n_spans,
        (1000000 * n_corrupted) // GREATEST(n_tokens, 1) AS corruption_ppm,
        md5(COALESCE(kept_txt, '')) AS kept_md5,
        md5(COALESCE(cut_txt, '')) AS corrupted_md5
    FROM sc_doc
) s"""


def fim_transform_plan(docs: DataFrame) -> DataFrame:
    """Per-document FIM (fill-in-the-middle) split plan: two
    deterministic cut points 0 ≤ c1 ≤ c2 ≤ n partition the token
    sequence into prefix/middle/suffix; mode PSM or SPM by a third
    coin — the document-level rearrangement of Bavarian et al. 2022
    (applied to ~half the corpus in production; here the rate coin is
    emitted so the consumer filters). md5s of all three segments pin
    the split itself."""
    n = F.size(F.col("tk"))
    h1 = _pos_hash(FIM_SEED, F.lit(1))
    h2 = _pos_hash(FIM_SEED, F.lit(2))
    h3 = _pos_hash(FIM_SEED, F.lit(3))
    c1 = h1 % (n + 1)
    c2 = F.col("c1") + h2 % (n - F.col("c1") + 1)
    seg = lambda a, b: F.md5(  # noqa: E731
        F.array_join(F.slice(F.col("tk"), a, b), " ")
    )
    return (
        docs.select("doc_id", tokens(F.col("text")).alias("tk"))
        .withColumn("c1", c1)
        .withColumn("c2", c2)
        .select(
            "doc_id",
            F.size("tk").cast("long").alias("n_tokens"),
            F.col("c1").cast("long").alias("cut1"),
            F.col("c2").cast("long").alias("cut2"),
            (h3 % 2 == 0).alias("is_psm"),
            seg(F.lit(1), F.col("c1")).alias("prefix_md5"),
            seg(F.col("c1") + 1, F.col("c2") - F.col("c1")).alias("middle_md5"),
            seg(F.col("c2") + 1, F.size("tk") - F.col("c2")).alias("suffix_md5"),
        )
    )


def fim_transform_plan_sql(source: str = "corpus_or_documents") -> str:
    def h(i: int) -> str:
        return portable_hash32_sql(
            f"CAST(doc_id AS VARCHAR) || ':' || CAST({i} AS VARCHAR)",
            seed=FIM_SEED,
        )

    return f"""(
    WITH fim_tk AS (
        SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS tk
        FROM {source}
    ),
    fim_c1 AS (
        SELECT doc_id, tk, ({h(1)}) % (len(tk) + 1) AS c1 FROM fim_tk
    ),
    fim_c2 AS (
        SELECT doc_id, tk, c1, c1 + (({h(2)}) % (len(tk) - c1 + 1)) AS c2
        FROM fim_c1
    )
    SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
        CAST(c1 AS BIGINT) AS cut1, CAST(c2 AS BIGINT) AS cut2,
        ({h(3)}) % 2 = 0 AS is_psm,
        md5(COALESCE(array_to_string(tk[1:c1], ' '), '')) AS prefix_md5,
        md5(COALESCE(array_to_string(tk[c1+1:c2], ' '), '')) AS middle_md5,
        md5(COALESCE(array_to_string(tk[c2+1:len(tk)], ' '), '')) AS suffix_md5
    FROM fim_c2
) s"""
