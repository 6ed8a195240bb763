"""Round-10 query specs: the incremental (delta-crawl) extension of the
winnowing/MOSS fingerprint family — probe this crawl's increment against
the frozen history fingerprint index (batch form here; the streamed twin
lives in plans/streaming_specs.py). The operator a crawl pipeline runs
daily, per VERDICT r9 #7."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import text_analysis as ta
from .registry import ColSpec, QuerySpec, shape, sql_select

EXTENSIONS_R10: dict[str, QuerySpec] = {}


WINNOW_INC_SPEC: ColSpec = [
    ("doc_id", "long"),
    ("n_fp", "long"),
    ("n_hist_matches", "long"),
    ("best_shared", "long"),
    ("best_overlap_permille", "long"),
    ("verdict", ""),
]


def _winnow_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serves from the session-cached fingerprint table of the
    dup-injected corpus (the frozen-index lifecycle: at 100 TB the
    history side is a written fingerprint index refreshed per snapshot,
    and the increment's fingerprints are the crawl batch's own build —
    measured here as the probe-join cost over the cached table). The
    count joins get the corpus-statistic-backed broadcast hint (the
    tfidf _query_side_hint discipline)."""
    from ..operators.tfidf import _query_side_hint

    return shape(
        ta.winnowing_incremental_overlap(
            ta.cached_winnowing_fps(spark, sf_dir),
            count_hint=_query_side_hint(spark, sf_dir),
        ),
        WINNOW_INC_SPEC,
    )


def _winnow_incremental_oracle() -> str:
    from ..operators.dedup import CORPUS_SQL

    return "WITH " + CORPUS_SQL.strip() + sql_select(
        WINNOW_INC_SPEC, ta.winnowing_incremental_overlap_sql("corpus")
    )


EXTENSIONS_R10["dedup_incremental_winnowing"] = QuerySpec(
    _winnow_incremental, _winnow_incremental_oracle()
)


# ------------------------- per-doc bigram-LM surprisal (CCNet gate)

BIGRAM_SURPRISAL_SPEC: ColSpec = [
    ("doc_id", "long"),
    ("lang", ""),
    ("n_bigrams", "long"),
    ("total_bits", "long"),
    ("mean_centibits", "long"),
]


def _bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import load_table

    return shape(
        ta.bigram_surprisal_per_doc(load_table(spark, sf_dir, "documents")),
        BIGRAM_SURPRISAL_SPEC,
    )


EXTENSIONS_R10["quality_bigram_surprisal"] = QuerySpec(
    _bigram_surprisal,
    sql_select(
        BIGRAM_SURPRISAL_SPEC, ta.bigram_surprisal_per_doc_sql("documents")
    ),
)


# ------------------------- dataloader batch-contamination audit

CONTAM_SPEC: ColSpec = [
    ("n_pairs", "long"),
    ("co_shard_pairs", "long"),
    ("co_batch_pairs", "long"),
    ("co_batch_permille", "long"),
]


def _batch_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composes two session artifacts: the verified near-dup pair table
    (cached_jaccard_pairs — build measured by dedup_ngram_jaccard) and
    the shuffle manifest of the SAME dup-injected corpus (the training
    set with its duplicates — that is what the dataloader actually
    batches)."""
    from ..operators import dedup as dd
    from ..operators import packing as pk

    manifest = pk.corpus_shuffle_manifest(dd.dedup_corpus(spark, sf_dir))
    pairs = dd.cached_jaccard_pairs(spark, sf_dir)
    return shape(pk.batch_contamination_audit(manifest, pairs), CONTAM_SPEC)


def _batch_contamination_oracle() -> str:
    from ..operators import dedup as dd
    from ..operators import packing as pk

    return (
        "WITH "
        + dd.CORPUS_SQL.strip()
        + ",\n"
        + dd.SHINGLES_SQL.strip()
        + sql_select(
            CONTAM_SPEC,
            pk.batch_contamination_audit_sql(dd.NGRAM_JACCARD_SQL, "corpus"),
        )
    )


EXTENSIONS_R10["dataloader_contamination_audit"] = QuerySpec(
    _batch_contamination, _batch_contamination_oracle()
)


# ------------------------------- UniMax budget allocation (mixture)

UNIMAX_SPEC: ColSpec = [
    ("source", ""),
    ("n_tokens", "long"),
    ("cap_tokens", "long"),
    ("allocated_tokens", "long"),
    ("capped", ""),
    ("epochs_permille", "long"),
]


def _unimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import mixture as mx
    from ..sources.catalog import load_table

    return shape(
        mx.mixture_unimax_allocation(load_table(spark, sf_dir, "documents")),
        UNIMAX_SPEC,
    )


def _unimax_oracle() -> str:
    from ..operators import mixture as mx

    return sql_select(UNIMAX_SPEC, mx.mixture_unimax_allocation_sql("documents"))


EXTENSIONS_R10["mixture_unimax_allocation"] = QuerySpec(_unimax, _unimax_oracle())


# ------------------------------ impact-ordered BM25 static pruning

BM25_IMPACT_SPEC: ColSpec = [
    ("query_id", "long"),
    ("doc_id", "long"),
    ("score_scaled", "long"),
    ("shared_terms", "long"),
    ("rank", "long"),
]

BM25_IMPACT_RECALL_SPEC: ColSpec = [
    ("n_queries", "long"),
    ("n_exact", "long"),
    ("hits", "long"),
    ("recall", "f4"),
]


def _bm25_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import tfidf as ti

    return shape(ti.bm25_impact_topk(spark, sf_dir), BM25_IMPACT_SPEC)


def _bm25_impact_oracle() -> str:
    from ..operators import tfidf as ti
    from ..operators.dedup import CORPUS_SQL

    return "WITH " + CORPUS_SQL.strip() + sql_select(
        BM25_IMPACT_SPEC, ti.bm25_impact_topk_sql()
    )


EXTENSIONS_R10["bm25_impact_topk"] = QuerySpec(_bm25_impact, _bm25_impact_oracle())


def _bm25_impact_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import tfidf as ti

    return shape(
        ti.bm25_impact_recall(spark, sf_dir), BM25_IMPACT_RECALL_SPEC
    )


def _bm25_impact_recall_oracle() -> str:
    from ..operators import tfidf as ti
    from ..operators.dedup import CORPUS_SQL

    return "WITH " + CORPUS_SQL.strip() + sql_select(
        BM25_IMPACT_RECALL_SPEC, ti.bm25_impact_recall_sql()
    )


EXTENSIONS_R10["bm25_impact_recall"] = QuerySpec(
    _bm25_impact_recall, _bm25_impact_recall_oracle()
)
