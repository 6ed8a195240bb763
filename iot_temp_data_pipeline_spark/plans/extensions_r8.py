"""Round-8 query specs (beyond-reference surface, SURVEY.md §2
extension block): the end-to-end corpus-curation flagship — the single
query shape a 100 TB training-data customer actually runs (VERDICT r7
#6): quality gate → exact dedup → near dedup → decontamination →
domain caps → sharded sequence packing, every stage off the shared
session-cached artifacts, with one exact DuckDB oracle recomputing the
whole chain from the parquet."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash32, portable_hash32_sql
from ..operators import dedup as dd
from ..operators import packing as pk
from ..operators import quality as qa
from ..operators import text_analysis as ta
from .registry import ColSpec, QuerySpec, shape, sql_select

EXTENSIONS_R8: dict[str, QuerySpec] = {}


# ------------------------------------- end-to-end curation flagship

# small shard so the sf0.01 fixture exercises many shards (same
# rationale as _PACK_SHARD_DOCS in extensions.py)
_CPF_SHARD_DOCS = 256

CPF_SPEC: ColSpec = [
    ("doc_id", "long"),
    ("lang", ""),
    ("source", ""),
    ("n_tokens", "long"),
    ("shard_id", "long"),
    ("seg_idx", "long"),
    ("bin_id", "long"),
    ("offset_in_bin", "long"),
    ("seg_len", "long"),
]


def _corpus_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation chain over the duplicate-injected corpus:

    1. text_stats quality gate (quality_score ≥ 0.4),
    2. exact dedup (min doc_id per md5(text) hash-groupBy),
    3. near dedup (session-cached Jaccard pair table → drop doc_b),
    4. decontamination (drop any train doc sharing an 8-gram with the
       frozen eval split — contaminated_docs' gram join),
    5. domain caps in THRESHOLD form (the skew-free scale path: tiny
       per-domain aggregate broadcast back, stateless filter, no
       per-domain sort),
    6. sharded grid packing from the already-computed token counts
       (pack_sharded_from_counts — no second text scan; one hash
       exchange on shard_id, shards packed in parallel).

    Scale shape: the corpus is scanned once into text_stats, once for
    exact-dedup keys, once for decontamination grams (all map-side
    bounded aggregations/joins); the near-dup pairs come from the
    build-once/serve-many materialization (cached_jaccard_pairs — the
    build path stays measured via dedup_ngram_jaccard); every stage
    after the gram join is bounded by the SURVIVOR set, and the final
    packing shuffles survivors exactly once on shard_id. At 100 TB
    each arrow in this chain is a written table between pipeline runs;
    here the composition is one lazy plan."""
    corpus = dd.dedup_corpus(spark, sf_dir).persist()
    stats = ta.text_stats(corpus)
    keep_exact = (
        corpus.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    near_drop = (
        dd.cached_jaccard_pairs(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    contam_drop = qa.contaminated_docs(corpus).select("doc_id")
    # Materialized ONCE (optimization r12, guide §1.2/§5): `surv` feeds
    # BOTH the per-domain count digest (a broadcast build subtree) and
    # the main capped branch, and broadcast-build subtrees run as
    # concurrent jobs — un-materialized, the ENTIRE gate→exact-dedup→
    # decontam chain (the expensive part of this flagship) evaluated
    # twice per run. localCheckpoint(eager) rather than persist():
    # the fork consumers launch concurrently under AQE, so a lazy
    # persist races both subtrees into a double build (the r11
    # hll_set_intersection finding); the eager barrier pays one tiny
    # materialization of narrow survivor rows and guarantees one
    # evaluation. Rebuilt per run (keyed to nothing), so the bench
    # still times the full chain. At 100 TB this is the written
    # survivors table between pipeline stages the docstring names.
    surv = (
        stats.join(keep_exact, "doc_id", "left_semi")
        .join(near_drop, "doc_id", "left_anti")
        .join(contam_drop, "doc_id", "left_anti")
        .filter(F.col("quality_score") >= 0.4)
        .select("doc_id", "lang", "source", "n_tokens")
        .localCheckpoint(eager=True)
    )
    # Every corpus consumer (stats / exact keys / contam grams) has
    # materialized behind the eager barrier — release the cache now
    # instead of leaking it for the session (r11 unpersist hygiene).
    corpus.unpersist()
    h = portable_hash32(F.col("doc_id").cast("string"), seed=qa.DOMAIN_SEED)
    counts = surv.groupBy("source").agg(F.count("*").alias("n_source"))
    capped = surv.join(F.broadcast(counts), "source").filter(
        h * F.col("n_source") < F.lit(qa.DOMAIN_CAP) * F.lit(1 << 32)
    )
    packed = pk.pack_sharded_from_counts(
        capped.select("doc_id", "n_tokens", "lang", "source"),
        shard_docs=_CPF_SHARD_DOCS,
        passthrough=("lang", "source"),
    )
    return shape(packed, CPF_SPEC)


def _cpf_oracle() -> str:
    h = portable_hash32_sql("CAST(doc_id AS VARCHAR)", seed=qa.DOMAIN_SEED)
    c, s = pk.CONTEXT_LEN, _CPF_SHARD_DOCS
    return (
        "WITH "
        + dd.CORPUS_SQL.strip()
        + ",\n"
        + dd.SHINGLES_SQL.strip()
        + sql_select(
            CPF_SPEC,
            f"""(
    WITH cpf_surv AS (
        SELECT doc_id, lang, source, n_tokens
        FROM {ta.text_stats_sql("corpus")}
        WHERE doc_id IN (SELECT MIN(doc_id) FROM corpus GROUP BY md5(text))
          AND doc_id NOT IN (SELECT DISTINCT doc_b FROM {dd.NGRAM_JACCARD_SQL})
          AND doc_id NOT IN (
              SELECT doc_id FROM {qa.contaminated_docs_sql("corpus")}
          )
          AND quality_score >= 0.4
    ),
    cpf_counts AS (
        SELECT source, COUNT(*) AS n_source FROM cpf_surv GROUP BY source
    ),
    cpf_capped AS (
        SELECT v.doc_id, v.lang, v.source, v.n_tokens
        FROM cpf_surv v JOIN cpf_counts n ON v.source = n.source
        WHERE ({h}) * n.n_source < {qa.DOMAIN_CAP} * 4294967296
    ),
    cpf_pd AS (
        SELECT doc_id, lang, source, doc_id // {s} AS shard_id,
            LEAST(n_tokens, {c}) AS n_tokens
        FROM cpf_capped
    ),
    cpf_pp AS (
        SELECT doc_id, lang, source, shard_id, n_tokens,
            COALESCE(SUM(n_tokens) OVER (PARTITION BY shard_id ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
        FROM cpf_pd
    ),
    cpf_pg AS (
        SELECT doc_id, lang, source, shard_id, n_tokens, pre,
            pre // {c} AS first_grid,
            (pre + n_tokens - 1) // {c} AS last_grid
        FROM cpf_pp
    )
    SELECT doc_id, lang, source, CAST(n_tokens AS BIGINT) AS n_tokens,
        CAST(shard_id AS BIGINT) AS shard_id,
        CAST(0 AS BIGINT) AS seg_idx,
        CAST(shard_id * {s} + first_grid AS BIGINT) AS bin_id,
        CAST(pre - first_grid * {c} AS BIGINT) AS offset_in_bin,
        CAST(LEAST(n_tokens, (first_grid + 1) * {c} - pre) AS BIGINT)
            AS seg_len
    FROM cpf_pg
    UNION ALL
    SELECT doc_id, lang, source, CAST(n_tokens AS BIGINT),
        CAST(shard_id AS BIGINT),
        CAST(1 AS BIGINT),
        CAST(shard_id * {s} + last_grid AS BIGINT),
        CAST(0 AS BIGINT),
        CAST(pre + n_tokens - last_grid * {c} AS BIGINT)
    FROM cpf_pg WHERE first_grid <> last_grid
) cpf""",
        )
    )


EXTENSIONS_R8["corpus_pipeline_full"] = QuerySpec(
    _corpus_pipeline_full, _cpf_oracle()
)


# --------------------------------------------- round-8 widening wave
# Late-interaction retrieval, matryoshka truncation eval, filtered
# vector search, the corpus novelty curve, PMI collocations, and
# per-source quantile calibration.

from ..operators import retrieval_ext as rx  # noqa: E402
from ..operators import similarity as sim  # noqa: E402
from ..sources.catalog import load_table  # noqa: E402

MAXSIM_SPEC: ColSpec = [
    ("query_doc", "long"),
    ("neighbor_doc", "long"),
    ("maxsim_micros", "long"),
    ("rank", "long"),
]


def _maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shape(rx.maxsim_topk(spark, sf_dir), MAXSIM_SPEC)


MAXSIM_ORACLE = (
    "WITH "
    + sim.QUANT_SQL.strip()
    + "\n"
    + sql_select(MAXSIM_SPEC, rx.maxsim_topk_sql())
)

EXTENSIONS_R8["colbert_maxsim_topk"] = QuerySpec(_maxsim, MAXSIM_ORACLE)


MATRYOSHKA_SPEC: ColSpec = [
    ("prefix_dim", "long"),
    ("n_queries", "long"),
    ("mean_recall_at_k", "f4"),
]


def _matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shape(rx.matryoshka_recall(spark, sf_dir), MATRYOSHKA_SPEC)


MATRYOSHKA_ORACLE = (
    "WITH "
    + sim.QUANT_SQL.strip()
    + ",\nmr_bf AS (SELECT query_id, neighbor_id FROM "
    + sim.knn_brute_force_sql()
    + ")\n"
    + sql_select(MATRYOSHKA_SPEC, rx.matryoshka_recall_sql())
)

EXTENSIONS_R8["matryoshka_recall_sweep"] = QuerySpec(
    _matryoshka, MATRYOSHKA_ORACLE
)


FILTERED_SPEC: ColSpec = [
    ("query_id", "long"),
    ("neighbor_id", "long"),
    ("label", "long"),
    ("cosine", ""),
    ("rank", "long"),
]


def _knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shape(rx.knn_label_filtered(spark, sf_dir), FILTERED_SPEC)


FILTERED_ORACLE = (
    "WITH "
    + sim.QUANT_SQL.strip()
    + "\n"
    + sql_select(FILTERED_SPEC, rx.knn_label_filtered_sql())
)

EXTENSIONS_R8["knn_label_filtered"] = QuerySpec(_knn_filtered, FILTERED_ORACLE)


CURVE_SPEC: ColSpec = [
    ("bucket", "long"),
    ("n_docs", "long"),
    ("n_new", "long"),
    ("docs_cum", "long"),
    ("new_cum", "long"),
    ("novelty_ppm", "long"),
    ("marginal_novelty_ppm", "long"),
]


def _dedup_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shape(
        dd.corpus_dedup_curve(dd.dedup_corpus(spark, sf_dir)), CURVE_SPEC
    )


CURVE_ORACLE = (
    "WITH "
    + dd.CORPUS_SQL.strip()
    + "\n"
    + sql_select(CURVE_SPEC, dd.corpus_dedup_curve_sql("corpus"))
)

EXTENSIONS_R8["corpus_dedup_curve"] = QuerySpec(_dedup_curve, CURVE_ORACLE)


PMI_SPEC: ColSpec = [
    ("w1", ""),
    ("w2", ""),
    ("c_ab", "long"),
    ("c_a", "long"),
    ("c_b", "long"),
    ("lift_ppm", "long"),
]


def _pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shape(
        ta.pmi_collocations(load_table(spark, sf_dir, "documents")), PMI_SPEC
    )


PMI_ORACLE = sql_select(PMI_SPEC, ta.pmi_collocations_sql("documents"))

EXTENSIONS_R8["pmi_collocations"] = QuerySpec(_pmi, PMI_ORACLE)


QNORM_SPEC: ColSpec = [
    ("doc_id", "long"),
    ("source", ""),
    ("quality_score", "f4"),
    ("src_rank", "long"),
    ("src_n", "long"),
    ("pr_ppm", "long"),
    ("decile", "long"),
]


def _quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    stats = ta.text_stats(load_table(spark, sf_dir, "documents"))
    return shape(qa.quality_quantile_normalize(stats), QNORM_SPEC)


QNORM_ORACLE = sql_select(
    QNORM_SPEC,
    qa.quality_quantile_normalize_sql(ta.text_stats_sql("documents")),
)

EXTENSIONS_R8["quality_quantile_normalize"] = QuerySpec(
    _quantile_normalize, QNORM_ORACLE
)


def _maxsim_pooled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shape(rx.maxsim_pooled_rerank(spark, sf_dir), MAXSIM_SPEC)


MAXSIM_POOLED_ORACLE = (
    "WITH "
    + sim.QUANT_SQL.strip()
    + "\n"
    + sql_select(MAXSIM_SPEC, rx.maxsim_pooled_rerank_sql())
)

EXTENSIONS_R8["maxsim_pooled_rerank"] = QuerySpec(
    _maxsim_pooled, MAXSIM_POOLED_ORACLE
)


MAXSIM_RECALL_SPEC: ColSpec = [
    ("n_queries", "long"),
    ("mean_recall_at_k", "f4"),
]


def _maxsim_pooled_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the pooled-shortlist MaxSim serve against exhaustive
    MaxSim — the quality dial for the route→refine composition (the
    sq8_recall_check of late interaction): how much of the exact
    late-interaction top-k survives routing on pooled vectors at
    shortlist depth r?

    Serves the exhaustive side from the session-cached ground-truth
    pair table (rx.cached_maxsim_truth — build once per corpus, serve
    every eval; the exhaustive build stays measured via
    colbert_maxsim_topk)."""
    full = rx.cached_maxsim_truth(spark, sf_dir)
    approx = rx.maxsim_pooled_rerank(spark, sf_dir).select(
        "query_doc", "neighbor_doc"
    )
    joined = full.join(
        approx.withColumn("hit", F.lit(1)),
        ["query_doc", "neighbor_doc"],
        "left",
    )
    df = joined.agg(
        F.countDistinct("query_doc").alias("n_queries"),
        (
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
            / F.count("*").cast("double")
        ).alias("mean_recall_at_k"),
    )
    return shape(df, MAXSIM_RECALL_SPEC)


MAXSIM_RECALL_ORACLE = (
    "WITH "
    + sim.QUANT_SQL.strip()
    + "\n"
    + sql_select(
        MAXSIM_RECALL_SPEC,
        f"""(
    WITH msr_full AS (
        SELECT query_doc, neighbor_doc FROM {rx.maxsim_topk_sql()}
    ),
    msr_approx AS (
        SELECT query_doc, neighbor_doc FROM {rx.maxsim_pooled_rerank_sql()}
    ),
    msr_per_q AS (
        SELECT f.query_doc, COUNT(*) AS k,
            SUM(CASE WHEN a.neighbor_doc IS NOT NULL THEN 1 ELSE 0 END) AS h
        FROM msr_full f
        LEFT JOIN msr_approx a ON f.query_doc = a.query_doc
                              AND f.neighbor_doc = a.neighbor_doc
        GROUP BY f.query_doc
    )
    SELECT COUNT(*) AS n_queries,
        CAST(SUM(h) AS DOUBLE) / CAST(SUM(k) AS DOUBLE) AS mean_recall_at_k
    FROM msr_per_q
) s""",
    )
)

EXTENSIONS_R8["maxsim_pooled_recall"] = QuerySpec(
    _maxsim_pooled_recall, MAXSIM_RECALL_ORACLE
)


PF_SPEC: ColSpec = [
    ("doc_a", "long"),
    ("doc_b", "long"),
    ("common_shingles", "long"),
    ("shingles_a", "long"),
    ("shingles_b", "long"),
    ("jaccard", ""),
]


def _prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shape(
        dd.jaccard_prefix_filter_pairs(dd.dedup_corpus(spark, sf_dir)),
        PF_SPEC,
    )


PF_ORACLE = (
    "WITH "
    + dd.CORPUS_SQL.strip()
    + ",\n"
    + dd.SHINGLES_SQL.strip()
    + "\n"
    + sql_select(PF_SPEC, dd.jaccard_prefix_filter_sql())
)

EXTENSIONS_R8["dedup_prefix_filter_join"] = QuerySpec(
    _prefix_filter_join, PF_ORACLE
)


HYBRID_SPEC: ColSpec = [
    ("query_id", "long"),
    ("doc_id", "long"),
    ("rrf_scaled", "long"),
    ("in_sparse", "long"),
    ("in_dense", "long"),
    ("rank", "long"),
]


def _hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shape(rx.hybrid_rrf_topk(spark, sf_dir), HYBRID_SPEC)


HYBRID_ORACLE = (
    "WITH "
    + dd.CORPUS_SQL.strip()
    + ",\n"
    + sim.QUANT_SQL.strip()
    + "\n"
    + sql_select(HYBRID_SPEC, rx.hybrid_rrf_sql())
)

EXTENSIONS_R8["hybrid_rrf_retrieval"] = QuerySpec(_hybrid_rrf, HYBRID_ORACLE)
