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

from ..functions.hashing import (
    affine_hash32_family,
    portable_hash32,
    portable_hash32_sql,
)
from ..functions.text import token_count

CONTEXT_LEN = 512
# docs longer than the context are truncated to it (the standard packing
# simplification; long-doc splitting is a separate chunking op)
ALPHA = 0.5  # temperature exponent for language re-sampling


def pack_sequences(docs: DataFrame, context_len: int = CONTEXT_LEN) -> DataFrame:
    """Grid sequence packing, concat-and-chunk layout: documents
    (ordered by doc_id — deterministic, reproducible batches) are laid
    head-to-tail on a token line; the line is cut into a fixed
    ``context_len`` grid, and each document is emitted as one row per
    grid cell it touches (docs are clipped to context_len, so a doc
    spans at most two cells → at most two segments). This is the
    standard pretraining packing: bins are exactly full (every bin but
    the last carries precisely ``context_len`` tokens), segment offsets
    within a bin are disjoint by construction, and a consumer can
    assemble each context window directly from (bin_id, offset_in_bin,
    seg_len) with zero padding and zero overlap.

    True greedy next-fit packing is a sequential scan (each break
    depends on all prior breaks — not expressible as a window
    function); the grid layout depends only on the global prefix sum,
    so it is ONE ordered-window pass. The unpartitioned window is the
    ORACLE-PARITY form (one sort partition — fine at test scale,
    serial at 100 TB); the production path is
    :func:`pack_sequences_sharded`, which keys the same plan by
    dataloader shard and packs shards in parallel.

    All bin arithmetic uses exact integer division (SQL ``div``, the
    DuckDB twin's ``//``): the global token-line prefix sum grows
    unboundedly with corpus size, and double division drifts past
    ~2^53.

    Output: (doc_id, n_tokens [clipped], seg_idx, bin_id,
    offset_in_bin, seg_len); seg_idx ∈ {0, 1} orders a split doc's
    segments (token ``offset_in_bin + i`` of segment 1 continues token
    ``seg_len_0 + i`` of the doc).
    """
    n_raw = token_count(F.col("text"))
    toks = F.least(n_raw, F.lit(context_len)).alias("n_tokens")
    d = docs.select("doc_id", toks)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    d = d.select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long").alias("pre"),
    )
    first_grid = F.expr(f"pre div {context_len}")
    last_grid = F.expr(f"(pre + n_tokens - 1) div {context_len}")
    head_len = (first_grid + 1) * context_len - F.col("pre")  # tokens in start cell
    seg0 = F.struct(
        F.lit(0).cast("long").alias("seg_idx"),
        first_grid.alias("bin_id"),
        (F.col("pre") - first_grid * context_len).alias("offset_in_bin"),
        F.least(F.col("n_tokens"), head_len).alias("seg_len"),
    )
    seg1 = F.struct(
        F.lit(1).cast("long").alias("seg_idx"),
        last_grid.alias("bin_id"),
        F.lit(0).cast("long").alias("offset_in_bin"),
        (F.col("pre") + F.col("n_tokens") - last_grid * context_len).alias("seg_len"),
    )
    segs = F.when(first_grid != last_grid, F.array(seg0, seg1)).otherwise(
        F.array(seg0)
    )
    return d.select(
        "doc_id", "n_tokens", F.explode(segs).alias("seg")
    ).select(
        "doc_id",
        "n_tokens",
        F.col("seg.seg_idx").alias("seg_idx"),
        F.col("seg.bin_id").alias("bin_id"),
        F.col("seg.offset_in_bin").alias("offset_in_bin"),
        F.col("seg.seg_len").alias("seg_len"),
    )


def pack_sequences_sql(source: str = "documents", context_len: int = CONTEXT_LEN) -> str:
    c = context_len
    return f"""(
    WITH pd AS (
        SELECT doc_id,
            LEAST(len(regexp_split_to_array(lower(text), '\\s+')),
                  {c}) AS n_tokens
        FROM {source}
    ),
    pp AS (
        SELECT doc_id, n_tokens,
            COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
        FROM pd
    ),
    pg AS (
        SELECT doc_id, n_tokens, pre,
            pre // {c} AS first_grid,
            (pre + n_tokens - 1) // {c} AS last_grid
        FROM pp
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        CAST(0 AS BIGINT) AS seg_idx,
        CAST(first_grid AS BIGINT) AS bin_id,
        CAST(pre - first_grid * {c} AS BIGINT) AS offset_in_bin,
        CAST(LEAST(n_tokens, (first_grid + 1) * {c} - pre) AS BIGINT) AS seg_len
    FROM pg
    UNION ALL
    SELECT doc_id, CAST(n_tokens AS BIGINT),
        CAST(1 AS BIGINT),
        CAST(last_grid AS BIGINT),
        CAST(0 AS BIGINT),
        CAST(pre + n_tokens - last_grid * {c} AS BIGINT)
    FROM pg WHERE first_grid <> last_grid
) pk"""


SHARD_DOCS = 4096  # docs per dataloader shard in the sharded packer


def pack_sequences_sharded(
    docs: DataFrame,
    context_len: int = CONTEXT_LEN,
    shard_docs: int = SHARD_DOCS,
) -> DataFrame:
    """Shard-keyed grid packing — the 100 TB form of
    :func:`pack_sequences`.

    The global variant's ``Window.orderBy("doc_id")`` prefix sum is
    correct but serializes the whole corpus through ONE sort partition
    (the last global-sort shape in this repo). Real dataloaders shard
    the corpus anyway, so key the token line by dataloader shard
    (``doc_id div shard_docs``) and pack each shard's line
    independently: the window becomes
    ``partitionBy(shard).orderBy(doc_id)`` — one ordinary hash-
    partitioned exchange, every shard packed in parallel, no global
    sort anywhere. Plan: Exchange(hashpartitioning(shard)) → per-
    partition sort → window → project/explode.

    Semantics vs the global grid: identical WITHIN a shard; each
    shard's token line starts at 0, so per ~shard_docs documents the
    last bin may be partial (exactly the padding a sharded dataloader
    pays). As ``shard_docs → ∞`` the output converges to
    :func:`pack_sequences`.

    ``bin_id`` stays globally unique without any cross-shard
    coordination: every doc is clipped to ``context_len`` tokens, so a
    shard's token line holds at most ``shard_docs * context_len``
    tokens → at most ``shard_docs`` local bins, and
    ``bin_id = shard * shard_docs + local_bin`` never collides.

    Output schema = pack_sequences + ``shard_id``.
    """
    n_raw = token_count(F.col("text"))
    return pack_sharded_from_counts(
        docs.select("doc_id", n_raw.alias("n_tokens")),
        context_len,
        shard_docs,
    )


def pack_sharded_from_counts(
    d: DataFrame,
    context_len: int = CONTEXT_LEN,
    shard_docs: int = SHARD_DOCS,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Sharded grid packing from a pre-computed (doc_id, n_tokens[raw],
    *passthrough) table — the composed-pipeline entry point: a curation
    chain already carries token counts (text_stats), so the packer must
    not re-scan text. ``passthrough`` columns ride along unchanged
    (lang/source attribution in the packed manifest). Same plan as
    :func:`pack_sequences_sharded`: one hash exchange on shard_id, a
    per-partition sort, one window — no global sort."""
    pt = list(passthrough)
    toks = F.least(F.col("n_tokens"), F.lit(context_len)).cast("long")
    shard = F.expr(f"doc_id div {shard_docs}").alias("shard_id")
    d = d.select("doc_id", toks.alias("n_tokens"), shard, *pt)
    w = (
        Window.partitionBy("shard_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.select(
        "doc_id",
        "n_tokens",
        "shard_id",
        *pt,
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long").alias("pre"),
    )
    first_grid = F.expr(f"pre div {context_len}")
    last_grid = F.expr(f"(pre + n_tokens - 1) div {context_len}")
    bin_base = F.col("shard_id") * shard_docs
    head_len = (first_grid + 1) * context_len - F.col("pre")
    seg0 = F.struct(
        F.lit(0).cast("long").alias("seg_idx"),
        (bin_base + first_grid).alias("bin_id"),
        (F.col("pre") - first_grid * context_len).alias("offset_in_bin"),
        F.least(F.col("n_tokens"), head_len).alias("seg_len"),
    )
    seg1 = F.struct(
        F.lit(1).cast("long").alias("seg_idx"),
        (bin_base + last_grid).alias("bin_id"),
        F.lit(0).cast("long").alias("offset_in_bin"),
        (F.col("pre") + F.col("n_tokens") - last_grid * context_len).alias(
            "seg_len"
        ),
    )
    segs = F.when(first_grid != last_grid, F.array(seg0, seg1)).otherwise(
        F.array(seg0)
    )
    return d.select(
        "doc_id", "n_tokens", "shard_id", *pt, F.explode(segs).alias("seg")
    ).select(
        "doc_id",
        "n_tokens",
        "shard_id",
        *pt,
        F.col("seg.seg_idx").alias("seg_idx"),
        F.col("seg.bin_id").alias("bin_id"),
        F.col("seg.offset_in_bin").alias("offset_in_bin"),
        F.col("seg.seg_len").alias("seg_len"),
    )


def pack_sequences_sharded_sql(
    source: str = "documents",
    context_len: int = CONTEXT_LEN,
    shard_docs: int = SHARD_DOCS,
) -> str:
    c, s = context_len, shard_docs
    return f"""(
    WITH pd AS (
        SELECT doc_id, doc_id // {s} AS shard_id,
            LEAST(len(regexp_split_to_array(lower(text), '\\s+')),
                  {c}) AS n_tokens
        FROM {source}
    ),
    pp AS (
        SELECT doc_id, n_tokens, shard_id,
            COALESCE(SUM(n_tokens) OVER (PARTITION BY shard_id ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
        FROM pd
    ),
    pg AS (
        SELECT doc_id, n_tokens, shard_id, pre,
            pre // {c} AS first_grid,
            (pre + n_tokens - 1) // {c} AS last_grid
        FROM pp
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        CAST(shard_id AS BIGINT) AS shard_id,
        CAST(0 AS BIGINT) AS seg_idx,
        CAST(shard_id * {s} + first_grid AS BIGINT) AS bin_id,
        CAST(pre - first_grid * {c} AS BIGINT) AS offset_in_bin,
        CAST(LEAST(n_tokens, (first_grid + 1) * {c} - pre) AS BIGINT) AS seg_len
    FROM pg
    UNION ALL
    SELECT doc_id, CAST(n_tokens AS BIGINT),
        CAST(shard_id AS BIGINT),
        CAST(1 AS BIGINT),
        CAST(shard_id * {s} + last_grid AS BIGINT),
        CAST(0 AS BIGINT),
        CAST(pre + n_tokens - last_grid * {c} AS BIGINT)
    FROM pg WHERE first_grid <> last_grid
) pks"""


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


# ------------------------------------------- padding-waste accounting

PAD_BUCKETS = (16, 32, 64, 128, 256, 512, 1024)


def padding_waste_by_bucket(docs: DataFrame) -> DataFrame:
    """Length-bucketed batching audit (the alternative to packing):
    if sequences are padded up to the next power-of-two bucket cap,
    how much compute is wasted per bucket? The accounting every
    batching strategy decision starts from — read next to
    pack_sequences_*, which this table justifies.

    One map-side CASE assigns the bucket, one groupBy(cap) reduces —
    the output is |buckets| rows regardless of corpus size. Integer
    token counts, float only in the final reported percentage."""
    n = token_count(F.col("text"))
    cap = None
    for b in PAD_BUCKETS:
        cap = F.when(n <= b, b) if cap is None else cap.when(n <= b, b)
    cap = cap.otherwise(n).cast("long")  # oversize: unpadded tail bucket
    return (
        docs.select(cap.alias("bucket_cap"), n.alias("n_tokens"))
        .groupBy("bucket_cap")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .withColumn(
            "total_padding",
            (F.col("bucket_cap") * F.col("n_docs") - F.col("total_tokens"))
            .cast("long"),
        )
        .withColumn(
            "padding_pct",
            F.round(
                F.col("total_padding").cast("double")
                / (F.col("bucket_cap") * F.col("n_docs")).cast("double")
                * 100,
                4,
            ),
        )
        .orderBy("bucket_cap")
    )


def padding_waste_by_bucket_sql(source: str = "documents") -> str:
    n = "len(regexp_split_to_array(lower(text), '\\s+'))"
    branches = " ".join(
        f"WHEN {n} <= {b} THEN {b}" for b in PAD_BUCKETS
    )
    return f"""(
    WITH bucketed AS (
        SELECT CAST(CASE {branches} ELSE {n} END AS BIGINT) AS bucket_cap,
               CAST({n} AS BIGINT) AS n_tokens
        FROM {source}
    )
    SELECT bucket_cap,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) * bucket_cap - SUM(n_tokens) AS BIGINT)
               AS total_padding,
           ROUND(CAST(COUNT(*) * bucket_cap - SUM(n_tokens) AS DOUBLE)
                 / CAST(bucket_cap * COUNT(*) AS DOUBLE) * 100, 4)
               AS padding_pct
    FROM bucketed
    GROUP BY bucket_cap
    ORDER BY bucket_cap
) s"""


# ------------------------------------------- deterministic corpus shuffle

SHUFFLE_SEED = 47
SHUFFLE_SHARDS = 64


def corpus_shuffle_manifest(
    docs: DataFrame,
    n_shards: int = SHUFFLE_SHARDS,
    seed: int = SHUFFLE_SEED,
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the dataloader
    manifest every training run derives from a frozen corpus: each doc
    gets a shard (hash-bucketed, so shards are balanced and any doc's
    placement is recomputable from its id alone) and a position within
    the shard (rank of its hash — a reproducible random permutation;
    change ``seed`` to reshuffle between epochs without touching data).

    A true global random permutation is a global sort; sharding first
    makes it ``N_SHARDS`` independent per-shard sorts — the window is
    partitionBy(shard_id), one ordinary hash exchange, no
    SinglePartition anywhere (the same decomposition as
    :func:`pack_sequences_sharded`, because dataloaders consume shards,
    not a single stream). md5-derived hash, so the DuckDB oracle
    reproduces the exact permutation."""
    h = portable_hash32(F.col("doc_id").cast("string"), seed=seed)
    d = docs.select(
        "doc_id",
        (h % n_shards).alias("shard_id"),
        h.alias("shuffle_key"),
    )
    w = Window.partitionBy("shard_id").orderBy("shuffle_key", "doc_id")
    return d.select(
        "doc_id",
        "shard_id",
        "shuffle_key",
        F.row_number().over(w).cast("long").alias("shard_pos"),
    )


def corpus_shuffle_manifest_sql(
    source: str = "documents",
    n_shards: int = SHUFFLE_SHARDS,
    seed: int = SHUFFLE_SEED,
) -> str:
    h = portable_hash32_sql("CAST(doc_id AS VARCHAR)", seed=seed)
    return f"""(
    SELECT doc_id, shard_id, shuffle_key,
        CAST(ROW_NUMBER() OVER (
            PARTITION BY shard_id ORDER BY shuffle_key, doc_id
        ) AS BIGINT) AS shard_pos
    FROM (
        SELECT doc_id, {h} % {n_shards} AS shard_id, {h} AS shuffle_key
        FROM {source}
    )
) csm"""


# ----------------------------------- batch contamination (co-batched dups)

CONTAM_BATCH_DOCS = 32  # dataloader batch size, in documents per shard


def batch_contamination_audit(
    manifest: DataFrame,
    pairs: DataFrame,
    batch_docs: int = CONTAM_BATCH_DOCS,
) -> DataFrame:
    """Near-dup CO-BATCHING audit: how many verified near-duplicate
    pairs land in the SAME dataloader batch under a given shuffle
    manifest. In-batch negatives are what contrastive objectives
    (InfoNCE/CLIP-style) train against — a near-duplicate sitting in
    the same batch as its twin becomes a FALSE negative and poisons
    the gradient; for plain LM training, co-batched duplicates
    concentrate memorization in single steps. This is the audit a
    pipeline runs after shuffling and before packing: if
    co_batch_permille is materially above the uniform-placement
    expectation, the shuffle (or an explicit dup-scatter pass) is
    broken.

    Inputs compose two session artifacts: the shuffle manifest
    (corpus_shuffle_manifest — (doc_id, shard_id, shard_pos)) and the
    verified near-dup pair table (dedup.cached_jaccard_pairs). Batch =
    (shard_pos − 1) div ``batch_docs`` within the shard. One row out:
    n_pairs, co_shard_pairs, co_batch_pairs, co_batch_permille (exact
    integer ÷).

    Scale shape: two equi-joins of the pair table against the
    manifest's (doc_id → placement) projection — pair-table-sized,
    never corpus² — plus a 1-row aggregate. At 100 TB both inputs are
    written tables; the joins shuffle on doc ids, or broadcast when
    the pair table is small."""
    place = manifest.select(
        "doc_id",
        "shard_id",
        F.expr(f"div(shard_pos - 1, {batch_docs})").alias("batch_id"),
    )
    pa = place.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shard_id").alias("shard_a"),
        F.col("batch_id").alias("batch_a"),
    )
    pb = place.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shard_id").alias("shard_b"),
        F.col("batch_id").alias("batch_b"),
    )
    placed = pairs.select("doc_a", "doc_b").join(pa, "doc_a").join(pb, "doc_b")
    # coalesce(…, 0): SUM over zero rows is NULL in Spark while the
    # DuckDB twin COALESCEs — a clean corpus with no near-dup pairs
    # must read (0, 0, 0, 0) in both engines (review r10).
    return placed.agg(
        F.count("*").alias("n_pairs"),
        F.coalesce(
            F.sum((F.col("shard_a") == F.col("shard_b")).cast("long")),
            F.lit(0),
        ).alias("co_shard_pairs"),
        F.coalesce(
            F.sum(
                (
                    (F.col("shard_a") == F.col("shard_b"))
                    & (F.col("batch_a") == F.col("batch_b"))
                ).cast("long")
            ),
            F.lit(0),
        ).alias("co_batch_pairs"),
    ).select(
        "n_pairs",
        "co_shard_pairs",
        "co_batch_pairs",
        F.expr(
            "div(1000 * co_batch_pairs, greatest(n_pairs, 1))"
        ).alias("co_batch_permille"),
    )


def batch_contamination_audit_sql(
    pairs_sql: str,
    manifest_source: str = "corpus",
    batch_docs: int = CONTAM_BATCH_DOCS,
) -> str:
    return f"""(
    WITH bc_place AS (
        SELECT doc_id, shard_id, (shard_pos - 1) // {batch_docs} AS batch_id
        FROM {corpus_shuffle_manifest_sql(manifest_source)}
    ),
    bc_pairs AS (SELECT doc_a, doc_b FROM {pairs_sql}),
    bc_placed AS (
        SELECT a.shard_id AS shard_a, a.batch_id AS batch_a,
               b.shard_id AS shard_b, b.batch_id AS batch_b
        FROM bc_pairs p
        JOIN bc_place a ON p.doc_a = a.doc_id
        JOIN bc_place b ON p.doc_b = b.doc_id
    )
    SELECT COUNT(*) AS n_pairs,
        COALESCE(SUM(CASE WHEN shard_a = shard_b THEN 1 ELSE 0 END), 0)
            AS co_shard_pairs,
        COALESCE(SUM(CASE WHEN shard_a = shard_b AND batch_a = batch_b
                 THEN 1 ELSE 0 END), 0) AS co_batch_pairs,
        (1000 * COALESCE(SUM(CASE WHEN shard_a = shard_b
                 AND batch_a = batch_b THEN 1 ELSE 0 END), 0))
            // GREATEST(COUNT(*), 1) AS co_batch_permille
    FROM bc_placed
) bc"""


# ------------------------------------------- resharding stability (HRW)

RESHARD_FROM = 64
RESHARD_TO = 65


def reshard_stability(
    docs: DataFrame,
    s_from: int = RESHARD_FROM,
    s_to: int = RESHARD_TO,
) -> DataFrame:
    """What fraction of the corpus MOVES when the shard count changes
    (64 → 65) under two placement functions — the corpus-management
    decision behind every re-layout at 100 TB:

    - ``mod``: shard = h(doc) % S. Adding one shard remaps ~all docs
      (every doc whose h % 64 ≠ h % 65 — ≈ 98%), so the whole corpus
      rewrites.
    - ``hrw`` (rendezvous / highest-random-weight): shard =
      argmax_s lane_s(doc). Adding shard 65 only claims the docs whose
      NEW lane beats all 64 old ones — ≈ 1/65 ≈ 15‰ move, the
      consistent-hashing guarantee, with zero coordination state.

    Lanes come from the multiply-shift affine family (ONE md5 per doc
    + S fused integer multiply-adds — the same trick that makes
    MinHash signatures cheap), so HRW costs barely more than mod and
    the DuckDB oracle reproduces every placement bit-for-bit. One
    corpus scan, one 1-row aggregate, a 2-row report."""
    key = F.col("doc_id").cast("string")
    h = portable_hash32(key, seed=SHUFFLE_SEED)
    lanes = affine_hash32_family(key, s_to)

    def hrw(n: int):
        entries = [
            F.struct(lanes[s].alias("v"), F.lit(-s).alias("s"))
            for s in range(n)
        ]
        return -F.array_max(F.array(*entries))["s"]

    d = docs.select(
        ((h % s_from) != (h % s_to)).cast("long").alias("moved_mod"),
        (hrw(s_from) != hrw(s_to)).cast("long").alias("moved_hrw"),
    )
    one = d.agg(
        F.count("*").alias("n_docs"),
        F.sum("moved_mod").alias("m_mod"),
        F.sum("moved_hrw").alias("m_hrw"),
    )
    report = F.array(
        F.struct(
            F.lit("mod").alias("method"),
            F.col("n_docs").alias("n_docs"),
            F.col("m_mod").alias("n_moved"),
            F.expr("div(1000 * m_mod, n_docs)").alias("moved_permille"),
        ),
        F.struct(
            F.lit("hrw").alias("method"),
            F.col("n_docs").alias("n_docs"),
            F.col("m_hrw").alias("n_moved"),
            F.expr("div(1000 * m_hrw, n_docs)").alias("moved_permille"),
        ),
    )
    return (
        one.select(F.explode(report).alias("r"))
        .select("r.method", "r.n_docs", "r.n_moved", "r.moved_permille")
        .orderBy("method")
    )


def reshard_stability_sql(
    source: str = "documents",
    s_from: int = RESHARD_FROM,
    s_to: int = RESHARD_TO,
) -> str:
    from ..functions.hashing import affine_hash32_family_sql

    key = "CAST(doc_id AS VARCHAR)"
    h = portable_hash32_sql(key, seed=SHUFFLE_SEED)
    lanes = affine_hash32_family_sql(key, s_to)

    def hrw(n: int) -> str:
        entries = ", ".join(
            f"{{'v': {lanes[s]}, 's': {-s}}}" for s in range(n)
        )
        return f"(-(list_max([{entries}])).s)"

    return f"""(
    WITH rflags AS (
        SELECT
            CAST(({h} % {s_from}) != ({h} % {s_to}) AS BIGINT) AS moved_mod,
            CAST({hrw(s_from)} != {hrw(s_to)} AS BIGINT) AS moved_hrw
        FROM {source}
    ),
    rone AS (
        SELECT COUNT(*) AS n_docs, SUM(moved_mod) AS m_mod,
               SUM(moved_hrw) AS m_hrw
        FROM rflags
    )
    SELECT 'mod' AS method, n_docs, m_mod AS n_moved,
           (1000 * m_mod) // n_docs AS moved_permille FROM rone
    UNION ALL
    SELECT 'hrw', n_docs, m_hrw, (1000 * m_hrw) // n_docs FROM rone
    ORDER BY method
) rs"""


# ------------------------------------------- range-partitioner bounds

RANGE_BIN_MILLI = 500   # histogram granularity (value milli-units)
RANGE_BUCKETS = 8


def range_partition_audit(
    events: DataFrame, n_buckets: int = RANGE_BUCKETS
) -> DataFrame:
    """Sort-free balanced range partitioning — the primitive behind
    `repartitionByRange` done deterministically: bucket BOUNDS come
    from a histogram CDF (the same machinery as curriculum_phases), so
    no global sort and no sampling nondeterminism; rows then map to
    buckets via (n_buckets - 1) broadcast comparisons. At 100 TB this
    is how you compute range-partitioner splits for a sorted write:
    one map-side-combined histogram (|bins| rows cross the wire), a
    bin-table-sized window, and a broadcast of (n_buckets - 1) cut
    points back over the data.

    Truncating div keeps bin ids monotone in value (both engines
    truncate toward zero), so CDF order == value order. The audit
    reports per-bucket row counts, value ranges, and the share each
    bucket holds (permille) — the skew a planner would act on."""
    vm = F.round(F.col("value") * 1000).cast("long")
    rows = events.select(vm.alias("vm")).select(
        "vm", F.expr(f"div(vm, {RANGE_BIN_MILLI})").alias("bin")
    )
    bins = rows.groupBy("bin").agg(F.count("*").alias("c"))
    wb = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cdf = bins.select("bin", F.sum("c").over(wb).alias("cum")).crossJoin(
        F.broadcast(rows.groupBy().agg(F.count("*").alias("n")))
    )
    cuts = cdf.agg(
        *[
            F.min(
                F.when(
                    n_buckets * F.col("cum") >= i * F.col("n"), F.col("bin")
                )
            ).alias(f"cut{i}")
            for i in range(1, n_buckets)
        ]
    )
    bucket = F.lit(1).cast("long")
    for i in range(1, n_buckets):
        bucket = bucket + (F.col("bin") > F.col(f"cut{i}")).cast("long")
    per_bucket = (
        rows.crossJoin(F.broadcast(cuts))
        .select(bucket.alias("bucket"), "vm")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("vm").alias("min_value_milli"),
            F.max("vm").alias("max_value_milli"),
        )
    )
    return (
        per_bucket.crossJoin(
            F.broadcast(rows.groupBy().agg(F.count("*").alias("n")))
        )
        .select(
            "bucket",
            "n_rows",
            "min_value_milli",
            "max_value_milli",
            F.expr("div(1000 * n_rows, n)").alias("share_permille"),
        )
        .orderBy("bucket")
    )


def range_partition_audit_sql(
    source: str = "events", n_buckets: int = RANGE_BUCKETS
) -> str:
    cut_exprs = ",\n            ".join(
        f"MIN(CASE WHEN {n_buckets} * cum >= {i} * n THEN bin END) AS cut{i}"
        for i in range(1, n_buckets)
    )
    bucket_expr = "1 + " + " + ".join(
        f"CAST(bin > cut{i} AS BIGINT)" for i in range(1, n_buckets)
    )
    return f"""(
    WITH rp_rows AS (
        SELECT vm, vm // {RANGE_BIN_MILLI} AS bin FROM (
            SELECT CAST(ROUND(value * 1000) AS BIGINT) AS vm FROM {source}
        )
    ),
    rp_n AS (SELECT COUNT(*) AS n FROM rp_rows),
    rp_cdf AS (
        SELECT bin, SUM(c) OVER (ORDER BY bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            (SELECT n FROM rp_n) AS n
        FROM (SELECT bin, COUNT(*) AS c FROM rp_rows GROUP BY bin)
    ),
    rp_cuts AS (
        SELECT {cut_exprs}
        FROM rp_cdf
    ),
    rp_assigned AS (
        SELECT {bucket_expr} AS bucket, vm
        FROM rp_rows CROSS JOIN rp_cuts
    )
    SELECT bucket, COUNT(*) AS n_rows,
        MIN(vm) AS min_value_milli, MAX(vm) AS max_value_milli,
        (1000 * COUNT(*)) // (SELECT n FROM rp_n) AS share_permille
    FROM rp_assigned
    GROUP BY bucket
    ORDER BY bucket
) rp"""


# --------------------------------------- epoch-shuffle decorrelation

EPOCH_SEED_1 = 51
EPOCH_SEED_2 = 52
FOOTRULE_SHARDS = 8


def epoch_shuffle_footrule(
    docs: DataFrame,
    n_shards: int = FOOTRULE_SHARDS,
    seed1: int = EPOCH_SEED_1,
    seed2: int = EPOCH_SEED_2,
) -> DataFrame:
    """Epoch-to-epoch shuffle decorrelation audit: Spearman's FOOTRULE
    distance Σ|pos_e1 − pos_e2| between two epochs' per-shard orders —
    the check that reseeding the deterministic shuffle actually
    produces an unrelated permutation (a broken epoch seed silently
    feeds the model the same curriculum twice; footrule ≈ n²/3 for
    independent permutations, 0 for identical ones — Diaconis–Graham's
    bounds relate it to Kendall/Spearman within constants).

    Shard assignment is content-stable (seed-0 hash) so both epochs
    rank the SAME doc set per shard; each epoch's order is its own
    seeded hash. Output per shard: n_docs, footrule_sum, and the exact
    normalized permille vs the ⌊n²/2⌋ maximum (independent
    permutations expect footrule ≈ n²/3 → ~667‰ of that maximum).

    Plan: one scan → ONE shard exchange carrying two windows over the
    same partitioning (two sorts, one shuffle) → per-shard aggregate
    bounded by the shard count. No SinglePartition — the same
    decomposition as corpus_shuffle_manifest."""
    h0 = portable_hash32(F.col("doc_id").cast("string"), seed=0)
    k1 = portable_hash32(F.col("doc_id").cast("string"), seed=seed1)
    k2 = portable_hash32(F.col("doc_id").cast("string"), seed=seed2)
    d = docs.select(
        "doc_id",
        (h0 % n_shards).alias("shard_id"),
        k1.alias("k1"),
        k2.alias("k2"),
    )
    w1 = Window.partitionBy("shard_id").orderBy("k1", "doc_id")
    w2 = Window.partitionBy("shard_id").orderBy("k2", "doc_id")
    ranked = d.select(
        "shard_id",
        F.row_number().over(w1).alias("p1"),
        F.row_number().over(w2).alias("p2"),
    )
    return (
        ranked.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.abs(F.col("p1") - F.col("p2"))).alias("footrule_sum"),
        )
        .select(
            F.col("shard_id").cast("long").alias("shard_id"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("footrule_sum").cast("long").alias("footrule_sum"),
            F.expr(
                "div(1000 * footrule_sum,"
                " greatest(div(n_docs * n_docs, 2), 1))"
            ).alias("footrule_permille_of_max"),
        )
    )


def epoch_shuffle_footrule_sql(
    source: str = "documents",
    n_shards: int = FOOTRULE_SHARDS,
    seed1: int = EPOCH_SEED_1,
    seed2: int = EPOCH_SEED_2,
) -> str:
    h0 = portable_hash32_sql("CAST(doc_id AS VARCHAR)", seed=0)
    k1 = portable_hash32_sql("CAST(doc_id AS VARCHAR)", seed=seed1)
    k2 = portable_hash32_sql("CAST(doc_id AS VARCHAR)", seed=seed2)
    return f"""(
    WITH ef_d AS (
        SELECT doc_id, ({h0}) % {n_shards} AS shard_id,
            {k1} AS k1, {k2} AS k2
        FROM {source}
    ),
    ef_r AS (
        SELECT shard_id,
            ROW_NUMBER() OVER (PARTITION BY shard_id ORDER BY k1, doc_id) AS p1,
            ROW_NUMBER() OVER (PARTITION BY shard_id ORDER BY k2, doc_id) AS p2
        FROM ef_d
    )
    SELECT CAST(shard_id AS BIGINT) AS shard_id,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(ABS(p1 - p2)) AS BIGINT) AS footrule_sum,
        (1000 * SUM(ABS(p1 - p2)))
            // GREATEST((COUNT(*) * COUNT(*)) // 2, 1) AS footrule_permille_of_max
    FROM ef_r
    GROUP BY shard_id
) ef"""


# --------------------------------------- sequence-length tradeoff curve

SEQLEN_CANDIDATES = (64, 128, 256, 512)


def seq_len_tradeoff(
    docs: DataFrame, candidates: tuple[int, ...] = SEQLEN_CANDIDATES
) -> DataFrame:
    """The max_seq_len decision table: for each candidate length L,
    what an example-per-sequence dataloader loses to TRUNCATION
    (tokens beyond L) and to PADDING (slots below L) — the two-sided
    waste curve a pipeline reads before fixing its context length
    (packed loaders kill padding but truncation loss is layout-
    independent, so the curve matters either way).

    Per L: n_docs, total_tokens, kept = Σ min(n, L), trunc = Σ
    max(n−L, 0), pad = Σ (L − min(n, L)), and exact utilization_ppm =
    10⁶·kept ÷ (n_docs·L). One corpus scan into per-doc lengths, a
    |candidates|-way explode of that LENGTH table (rows = docs ×
    |L| — lengths only, never text), one map-side-combined aggregate
    to |candidates| rows."""
    lens = docs.select(token_count(F.col("text")).alias("n"))
    cand = F.explode(
        F.array(*[F.lit(int(c)) for c in candidates])
    ).alias("seq_len")
    per = lens.select("n", cand)
    kept = F.least(F.col("n"), F.col("seq_len"))
    return (
        per.groupBy("seq_len")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            F.sum(kept).alias("kept_tokens"),
            F.sum(F.greatest(F.col("n") - F.col("seq_len"), F.lit(0))).alias(
                "trunc_tokens"
            ),
            F.sum(F.col("seq_len") - kept).alias("pad_tokens"),
        )
        .select(
            F.col("seq_len").cast("long").alias("seq_len"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
            F.col("kept_tokens").cast("long").alias("kept_tokens"),
            F.col("trunc_tokens").cast("long").alias("trunc_tokens"),
            F.col("pad_tokens").cast("long").alias("pad_tokens"),
            F.expr(
                "div(1000000 * kept_tokens, n_docs * seq_len)"
            ).alias("utilization_ppm"),
        )
    )


def seq_len_tradeoff_sql(
    source: str = "documents",
    candidates: tuple[int, ...] = SEQLEN_CANDIDATES,
) -> str:
    cands = ", ".join(str(c) for c in candidates)
    return f"""(
    WITH sl_len AS (
        SELECT len(regexp_split_to_array(lower(text), '\\s+')) AS n
        FROM {source}
    ),
    sl_x AS (
        SELECT n, unnest([{cands}]) AS seq_len FROM sl_len
    )
    SELECT CAST(seq_len AS BIGINT) AS seq_len,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n) AS BIGINT) AS total_tokens,
        CAST(SUM(LEAST(n, seq_len)) AS BIGINT) AS kept_tokens,
        CAST(SUM(GREATEST(n - seq_len, 0)) AS BIGINT) AS trunc_tokens,
        CAST(SUM(seq_len - LEAST(n, seq_len)) AS BIGINT) AS pad_tokens,
        (1000000 * SUM(LEAST(n, seq_len)))
            // (COUNT(*) * seq_len) AS utilization_ppm
    FROM sl_x
    GROUP BY seq_len
) sl"""
