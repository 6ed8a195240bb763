"""Misra-Gries heavy-hitters sketch (beyond-reference surface): the
fixed-memory frequent-items counter every streaming/profiling stack
carries alongside HLL (distinct) and quantile sketches.

This is the repo's showcase of a CUSTOM AGGREGATION implemented on the
Arrow-batched Python path (`mapInPandas`): Spark has no built-in
frequent-items sketch with error guarantees, and Misra-Gries is not
expressible as column algebra — each batch folds into k counters with
data-dependent evictions. The implementation keeps the Spark contract
honest:

- one `mapInPandas` pass emits each PARTITION's k-counter summary
  (≤ k rows per partition — constant memory, mergeable, the map-side
  combine shape);
- summaries merge with a plain groupBy SUM (Misra-Gries summaries are
  mergeable by counter addition; the error bounds add);
- the guarantee checked: for every TRUE top-n item, the sketch holds a
  counter, and its underestimate is within the deterministic MG bound
  Σ_p (N_p / k) (per-partition deficit sum).

The sketch estimate itself depends on partition layout, so the oracle
pins the GUARANTEE, not the estimate: true top-n items (exact counts,
reproducible in SQL) each carry sketch_found / within_bound flags that
must be TRUE — same statistical-contract pattern as the HLL and
stratified-sampling entries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens

MG_COUNTERS = 1024
MG_TOPN = 10


def _mg_partition_summaries(k: int):
    """Weighted (batched) Misra-Gries fold: per Arrow batch, counts
    merge vectorized (value_counts); whenever more than k counters are
    live, subtract the smallest value that evicts down to ≤ k from ALL
    live counters and drop the non-positive ones. Each such round
    removes its δ from ≥ k+1 items' mass, so the per-partition
    underestimate keeps the classic MG bound ≤ N_p/(k+1) while the fold
    stays pandas-vectorized (no per-item Python loop)."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = pd.Series(dtype="int64")
        n_seen = 0
        for pdf in batches:
            vc = pdf["item"].value_counts()
            n_seen += int(vc.sum())
            counters = counters.add(vc, fill_value=0).astype("int64")
            if len(counters) > k:
                # δ = (len-k)-th smallest value ⇒ ≥ len-k evictions
                delta = int(counters.nsmallest(len(counters) - k).iloc[-1])
                counters = counters - delta
                counters = counters[counters > 0]
        yield pd.DataFrame(
            {
                "item": list(counters.index) + ["\x00deficit"],
                "mg_count": [int(v) for v in counters.values] + [n_seen],
            }
        )

    return fold


def mg_heavy_hitters(docs: DataFrame, k: int = MG_COUNTERS, topn: int = MG_TOPN) -> DataFrame:
    """Bigram heavy hitters over the corpus with the MG bound checked
    against exact counts. Returns the true top-``topn`` bigrams with
    (bigram, true_count, sketch_found, within_bound)."""
    tk = tokens(F.col("text"))
    d = docs.select(tk.alias("tk")).filter(F.size("tk") >= 2)
    items = d.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("tk"), 1, F.size("tk") - 1),
                F.slice(F.col("tk"), 2, F.size("tk") - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("item")
    )
    summaries = items.mapInPandas(
        _mg_partition_summaries(k), schema="item string, mg_count long"
    )
    merged = summaries.groupBy("item").agg(F.sum("mg_count").alias("mg_count"))
    return mg_report(items, merged, k=k, topn=topn)


def mg_report(
    items: DataFrame, merged: DataFrame, k: int = MG_COUNTERS, topn: int = MG_TOPN
) -> DataFrame:
    """Heavy-hitter report from MERGED MG partials — split out so the
    streaming path (per-micro-batch partial summaries appended to a
    partials table, merged by SUM on read) shares the exact bound
    algebra with the batch sketch. The MG guarantee is partitioning-
    independent: the bound uses Σ N_p (the deficit row), which is the
    same total however the items were split into partitions/batches."""
    # the reserved deficit row carries Σ N_p; MG underestimates by at
    # most N_p/k per partition, and partition count ≤ 2·k rows each, so
    # bound with the conservative Σ N_p / k (deficit_total / k).
    deficit_total = merged.filter(F.col("item") == "\x00deficit").select(
        F.col("mg_count").alias("deficit")
    )
    sketch = merged.filter(F.col("item") != "\x00deficit")
    exact_top = (
        items.groupBy("item")
        .agg(F.count("*").alias("true_count"))
        .orderBy(F.col("true_count").desc(), "item")
        .limit(topn)
    )
    return (
        exact_top.join(sketch, "item", "left")
        .crossJoin(F.broadcast(deficit_total))
        .select(
            F.col("item").alias("bigram"),
            "true_count",
            F.col("mg_count").isNotNull().alias("sketch_found"),
            (
                F.col("mg_count").isNotNull()
                & (F.col("true_count") - F.coalesce(F.col("mg_count"), F.lit(0))
                   <= F.col("deficit") / F.lit(k))
            ).alias("within_bound"),
        )
    )


def mg_heavy_hitters_sql(source: str = "documents", topn: int = MG_TOPN) -> str:
    """Oracle: exact top-n bigrams with both guarantee flags pinned TRUE
    (any true top-n bigram at this corpus size clears count > N/k, so MG
    must track it and the underestimate must sit within the bound)."""
    return f"""(
    SELECT t.tk[s.i] || ' ' || t.tk[s.i + 1] AS bigram,
        COUNT(*) AS true_count,
        TRUE AS sketch_found,
        TRUE AS within_bound
    FROM (SELECT regexp_split_to_array(lower(text), '\\s+') AS tk
          FROM {source}) t
    JOIN (SELECT UNNEST(generate_series(1,
              (SELECT MAX(len(regexp_split_to_array(lower(text), '\\s+')))
               FROM {source}))) AS i) s
      ON s.i <= len(t.tk) - 1
    WHERE len(t.tk) >= 2
    GROUP BY 1
    ORDER BY true_count DESC, bigram
    LIMIT {topn}
) mg"""


# ------------------------------------------------------------ Count-Min

CMS_WIDTH = 2048
CMS_DEPTH = 3
CMS_TOPN = 20


def cms_token_frequencies(
    docs: DataFrame,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
    topn: int = CMS_TOPN,
) -> DataFrame:
    """Count-Min sketch over corpus tokens — the mergeable fixed-memory
    frequency sketch complementing Misra-Gries: MG keeps the heavy
    hitters (underestimates, layout-dependent), CMS answers point
    frequency queries for ANY item (never underestimates, and — unlike
    MG — the sketch content is a pure function of the DATA, independent
    of partition layout: cell (j, c) is just the count of items whose
    j-th hash lands on c).

    That layout-independence is why this oracle is STRONGER than MG's:
    DuckDB recomputes the identical sketch from the same md5-derived
    hash family (functions/hashing.py) and the estimates hash-match
    exactly, rather than pinning a guarantee flag.

    Plan shape: build = one explode(depth cells/item) + partial/final
    count — the partial aggregate caps each task's output at
    depth x width rows, so the shuffle is sketch-sized regardless of
    corpus size (the mergeable-sketch contract); estimate = the exact
    top-n probe side broadcast-joined against the (tiny) cell table,
    min over depth rows.

    Returns (item, true_count, cms_estimate) for the true top-``topn``
    tokens; CMS guarantees cms_estimate >= true_count always, within
    e*N/width with probability 1 - exp(-depth) per item.

    r9 build shape: cells are ADDITIVE in item multiplicity —
    cell(j,c) = Σ_{h_j(item)=c} count(item) — so the corpus pays ONE
    hash-free groupBy(item) pass and the sketch hashes only DISTINCT
    items weighted by their counts (vocabulary-bounded, the same table
    the exact-top-n probe side already needed). The earlier form
    exploded depth position rows and a digest per corpus TOKEN —
    hash work |corpus|·depth vs |vocab|; identical sketch by
    construction."""
    items = docs.select(F.explode(tokens(F.col("text"))).alias("item"))
    return cms_estimates(items, cms_cells(items, width, depth), width, depth, topn)


def _cms_position_rows(df, width: int, depth: int):
    """Explode ``df`` (holding an ``item`` column) into (row, col)
    sketch positions: depth ≤ 4 rows from the WORDS of ONE md5 digest
    (the portable_hash32_family word-slice family — a digest's 32-bit
    words are independent, the hash-family class CMS's per-row
    pairwise-independence needs). The digest is bound as a column that
    the depth lane expressions each reference, so CollapseProject's
    duplicate-expensive-expression guard materializes it ONCE per item
    — the earlier seed-per-row family paid depth full digests (no CSE
    reaches inside a generator input), ~depth× the hash cost of this
    form on the build pass where md5 dominates."""
    # Explicit raise, not assert (ADVICE r9): under python -O an assert
    # is stripped, and depth=5 would substring past the 32-char md5
    # (NULL lanes) while the DuckDB twin's portable_hash32_family_sql
    # correctly rolls to a second digest — a silent cross-engine
    # divergence. Fail loudly in every interpreter mode instead.
    if depth > 4:
        raise ValueError(
            f"word-slice hash family yields 4 lanes per md5 digest; "
            f"depth={depth} > 4 would read past the digest (extend to "
            "multi-digest groups to go deeper)"
        )
    lanes = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                F.pmod(
                    F.conv(
                        F.substring(F.col("cms_d"), 1 + 8 * j, 8), 16, 10
                    ).cast("long"),
                    width,
                ).alias("col"),
            )
            for j in range(depth)
        ]
    )
    return df.withColumn(
        "cms_d", F.md5(F.concat(F.lit("0:"), F.col("item")))
    ).select(
        *[c for c in df.columns], F.explode(lanes).alias("c")
    )


def cms_cells(
    items: DataFrame, width: int = CMS_WIDTH, depth: int = CMS_DEPTH
) -> DataFrame:
    """The sketch itself: (row, col, cnt) cell counts for an ``item``
    column. Pure function of the multiset of items — mergeable across
    partitions, batches, or streams by summing cnt per cell. Built by
    counting items FIRST and hashing only the distinct-item table
    weighted by multiplicity (cells are additive in counts), so hash
    work is vocabulary-, not corpus-, sized."""
    counts = items.groupBy("item").agg(F.count("*").alias("icnt"))
    return (
        _cms_position_rows(counts, width, depth)
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.sum("icnt").alias("cnt"))
    )


def cms_estimates(
    items: DataFrame,
    cells: DataFrame,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
    topn: int = CMS_TOPN,
) -> DataFrame:
    """Point-frequency probes: the exact top-``topn`` items (ground
    truth) against the broadcast cell table, min over depth rows."""
    exact_top = (
        items.groupBy("item")
        .agg(F.count("*").alias("true_count"))
        .orderBy(F.col("true_count").desc(), "item")
        .limit(topn)
    )
    probes = _cms_position_rows(exact_top, width, depth).select(
        "item",
        "true_count",
        F.col("c.row").alias("row"),
        F.col("c.col").alias("col"),
    )
    return (
        probes.join(F.broadcast(cells), ["row", "col"])
        .groupBy("item", "true_count")
        .agg(F.min("cnt").alias("cms_estimate"))
    )


def cms_token_frequencies_sql(
    source: str = "documents",
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
    topn: int = CMS_TOPN,
) -> str:
    """DuckDB twin: rebuilds the identical sketch (same word-slice md5
    hash family, same width/depth) and recomputes every estimate
    exactly. Parallel unnests of the row-index and lane-column lists
    zip positionally (DuckDB semantics), mirroring the Spark
    inline-struct-array explode."""
    from ..functions.hashing import portable_hash32_family_sql

    js = ", ".join(str(j) for j in range(depth))
    cols = ", ".join(
        f"{lane} % {width}"
        for lane in portable_hash32_family_sql("item", depth)
    )
    return f"""(
    WITH cms_items AS (
        SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS item
        FROM {source}
    ),
    cms_cells AS (
        SELECT j, col, COUNT(*) AS cnt
        FROM (
            SELECT unnest([{js}]) AS j, unnest([{cols}]) AS col
            FROM cms_items
        ) pos
        GROUP BY 1, 2
    ),
    cms_top AS (
        SELECT item, COUNT(*) AS true_count FROM cms_items
        GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT {topn}
    ),
    cms_probes AS (
        SELECT item, true_count, j, col
        FROM (
            SELECT item, true_count,
                unnest([{js}]) AS j, unnest([{cols}]) AS col
            FROM cms_top
        ) p
    )
    SELECT item, true_count, MIN(cnt) AS cms_estimate
    FROM cms_probes JOIN cms_cells USING (j, col)
    GROUP BY item, true_count
) cms"""


# --------------------------------------------------- histogram quantiles

HIST_WIDTH_CENTS = 10_000  # $100 equi-width bins
HIST_QS = (25, 50, 75, 90, 99)


def histogram_quantiles(
    lineitem: DataFrame,
    width: int = HIST_WIDTH_CENTS,
    qs: tuple[int, ...] = HIST_QS,
) -> DataFrame:
    """Equi-width histogram CDF quantile sketch over l_extendedprice —
    the ANALYZE-histogram companion to the GK bound check
    (approx_percentile_check): a fixed-memory, MERGEABLE quantile
    summary whose content is a pure function of the data.

    Like the Count-Min entry (and unlike Misra-Gries), the sketch is
    layout-independent: bin b just counts rows with value div width ==
    b, so partial aggregates merge by addition and DuckDB rebuilds the
    identical histogram — every estimate hash-matches exactly rather
    than pinning a bound flag. Prices quantize to integer cents
    (round(x*100), the similarity module's trick) so the binning has no
    float-boundary ambiguity between engines.

    Plan: one map-side combined groupBy(bin) — shuffle bounded at
    range/width rows per task — then the CDF walk and quantile probes
    run over the ~1000-row histogram. Estimate error is deterministic:
    est is the lower edge of the first bin whose running count reaches
    ceil(q·N/100), so 0 <= true_quantile - est < width, always.

    Output per q: (q, n, est_cents)."""
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    hist = (
        lineitem.select((cents / width).cast("long").alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
    )
    return histogram_quantile_report(hist, width=width, qs=qs)


def histogram_quantile_report(
    hist: DataFrame,
    width: int = HIST_WIDTH_CENTS,
    qs: tuple[int, ...] = HIST_QS,
) -> DataFrame:
    """Quantile probes from a MERGED (bin, cnt) histogram — split out so
    the streaming path (per-micro-batch bin-count partials merged by
    SUM) shares the exact CDF math with the batch sketch. Bin counts
    are layout- and batching-independent, so the batch oracle pins the
    streamed estimates exactly."""
    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cdf = hist.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy())
    )
    # all probes in ONE pass over the ~1000-row histogram: explode the
    # q list per bin, keep bins at-or-past each threshold (ceil(q*N/100)
    # in exact integer arithmetic), take the first such bin per q
    return (
        cdf.select(
            "bin",
            "cum",
            "n",
            F.explode(F.array(*[F.lit(q).cast("long") for q in qs])).alias("q"),
        )
        .filter(F.col("cum") >= F.expr("(n * q + 99) div 100"))
        .groupBy("q", "n")
        .agg((F.min("bin") * width).alias("est_cents"))
        .select("q", "n", "est_cents")
    )


def histogram_quantiles_sql(
    source: str = "lineitem",
    width: int = HIST_WIDTH_CENTS,
    qs: tuple[int, ...] = HIST_QS,
) -> str:
    q_list = ", ".join(str(q) for q in qs)
    probes = f"""SELECT q, n, MIN(bin) * {width} AS est_cents
    FROM (SELECT bin, cum, n, unnest([{q_list}]) AS q FROM hq_cdf) e
    WHERE cum >= (n * q + 99) // 100
    GROUP BY q, n"""
    return f"""(
    WITH hq_hist AS (
        SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) // {width} AS bin,
            COUNT(*) AS cnt
        FROM {source} GROUP BY 1
    ),
    hq_cdf AS (
        SELECT bin, cnt,
            SUM(cnt) OVER (ORDER BY bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            SUM(cnt) OVER () AS n
        FROM hq_hist
    )
    {probes}
) hq"""


# ------------------------------------------- HyperLogLog (deterministic)

HLL_M = 64  # registers (p = 6)
HLL_W = 26  # remaining hash bits after the bucket index (32 - 6)
HLL_RHO_MAX = HLL_W + 1
HLL_ALPHA_PPM = 709_000  # alpha_64 = 0.709, parts-per-million
# alpha * m^2 * 2^rho_max, the integer numerator of the raw estimate
_HLL_EST_NUM = HLL_ALPHA_PPM * HLL_M * HLL_M * (1 << HLL_RHO_MAX)


def hll_distinct_registers(
    events: DataFrame, group_col: str = "event_type", key_col: str = "user_id"
) -> DataFrame:
    """Register-level HyperLogLog distinct-count sketch, fully
    deterministic across engines — the companion to the engine-opaque
    `approx_count_distinct` entry (plans/analytics.py:380): there the
    oracle can only pin an error BOUND on Spark's internal HLL++; here
    the sketch itself is rebuilt bit-for-bit by DuckDB (same md5 hash
    family as every sketch in this repo — functions/hashing.py), so the
    register states AND the estimate hash-match exactly.

    Construction (classic Flajolet HLL, m=64 / p=6 on a 32-bit hash):
    bucket = h mod 64, rho = leading-zero count of the remaining 26-bit
    word + 1 (27 for an all-zero word), register M_b = max(rho). The
    harmonic denominator sum(2^-M_b) is kept EXACT as the integer
    S = sum(2^(27 - M_b)) (empty registers contribute 2^27), and the raw
    estimate alpha*m^2/sum(2^-M) becomes the pure-integer
    (alpha_ppm * m^2 * 2^27) div (1e6 * S) — no libm, no float division,
    so cross-engine parity is exact (the DSIR entry's integer-rational
    trick applied to HLL). Small-range (linear-counting) correction is
    deliberately NOT folded into the pinned value — ln() is libm — but
    its input V is derivable from the emitted nonzero_registers.

    Plan shape / scale contract: registers are a groupBy(grp, bucket)
    max — partial aggregation caps every task's shuffle output at
    |groups| x 64 rows regardless of row count (registers merge by MAX:
    associative, commutative — the same mergeable-sketch contract as the
    CMS cells). The empty-bucket fill joins the |groups|-row dim against
    a broadcast 64-row series; the exact count (verification column)
    runs beside it and broadcast-joins back.

    Output per group: (group, exact_keys, nonzero_registers,
    harmonic_scaled, hll_raw_est)."""
    reg = hll_registers(events, group_col, key_col)
    exact = events.groupBy(F.col(group_col).alias("grp")).agg(
        F.count_distinct(key_col).alias("exact_keys")
    )
    return hll_estimate(reg, exact)


def hll_registers(
    events: DataFrame, group_col: str = "event_type", key_col: str = "user_id"
) -> DataFrame:
    """The sketch itself: per-(grp, bucket) register maxima — the
    mergeable partial (registers merge by MAX across partitions, files,
    or micro-batches; see streaming_hll_partials)."""
    from ..functions.hashing import portable_hash32

    h = portable_hash32(F.col(key_col).cast("string"))
    rho_df = events.select(
        F.col(group_col).alias("grp"),
        F.pmod(h, F.lit(HLL_M)).alias("bucket"),
        (
            F.lit(HLL_RHO_MAX)
            - F.when(F.shiftright(h, 6) == 0, F.lit(0)).otherwise(
                F.length(F.conv(F.shiftright(h, 6).cast("string"), 10, 2))
            )
        ).alias("rho"),
    )
    return rho_df.groupBy("grp", "bucket").agg(F.max("rho").alias("m"))


def hll_estimate(reg: DataFrame, exact: DataFrame) -> DataFrame:
    """Estimate assembly over a (grp, bucket, m) register table: fold
    the exact-integer harmonic sum in ONE group-sized aggregate,
    broadcast-join the verification columns.

    Empty buckets are folded ARITHMETICALLY, not materialized: a bucket
    absent from ``reg`` contributes 2^rho_max to the harmonic sum and 0
    to nonzero_registers, so ``harmonic_scaled = Σ_present 2^(rho_max−m)
    + (64 − n_present) · 2^rho_max`` — identical values to the previous
    fill-join form (plan-diffed + hash-pinned r11), with the per-group
    64-row crossJoin series, the left fill join, and the corpus-wide
    ``reg.select("grp").distinct()`` pass it forced all gone (that
    distinct re-evaluated the whole register subtree a second time —
    the plan had THREE full scans of events for this query, now two:
    the exact count and the register build). Works for any merged
    register table (streamed partials, the union sketch): present rows
    with m = 0 would still count as empty via the m > 0 guard, though
    no builder in this repo emits them (rho ≥ 1 by construction)."""
    agg = reg.groupBy("grp").agg(
        F.sum(F.when(F.col("m") > 0, 1).otherwise(0)).alias("nonzero_registers"),
        (
            F.sum(
                F.when(
                    F.col("m") > 0,
                    F.expr(f"shiftleft(1L, {HLL_RHO_MAX} - m)"),
                ).otherwise(F.lit(1 << HLL_RHO_MAX))
            )
            + (F.lit(HLL_M) - F.count("*")) * F.lit(1 << HLL_RHO_MAX)
        ).alias("harmonic_scaled"),
    )
    return (
        exact.join(F.broadcast(agg), "grp")
        .withColumn(
            "hll_raw_est",
            F.expr(f"{_HLL_EST_NUM} div (1000000 * harmonic_scaled)"),
        )
        .orderBy("grp")
    )


def hll_distinct_registers_sql(
    source: str = "events", group_col: str = "event_type", key_col: str = "user_id"
) -> str:
    """DuckDB twin of :func:`hll_distinct_registers` — rebuilds the
    identical registers and integer estimate."""
    from ..functions.hashing import portable_hash32_sql

    h = portable_hash32_sql(f"CAST({key_col} AS VARCHAR)")
    return f"""(
    WITH hll_rho AS (
        SELECT {group_col} AS grp, h % {HLL_M} AS bucket,
            {HLL_RHO_MAX} - (CASE WHEN h // {HLL_M} = 0 THEN 0
                ELSE length(bin(h // {HLL_M})) END) AS rho
        FROM (SELECT {group_col}, {h} AS h FROM {source})
    ),
    hll_reg AS (
        SELECT grp, bucket, MAX(rho) AS m FROM hll_rho GROUP BY 1, 2
    ),
    hll_full AS (
        SELECT g.grp, b.bucket, COALESCE(r.m, 0) AS m
        FROM (SELECT DISTINCT grp FROM hll_reg) g
        CROSS JOIN (SELECT unnest(generate_series(0, {HLL_M - 1})) AS bucket) b
        LEFT JOIN hll_reg r ON r.grp = g.grp AND r.bucket = b.bucket
    ),
    hll_agg AS (
        SELECT grp,
            SUM(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS nonzero_registers,
            SUM(1::BIGINT << ({HLL_RHO_MAX} - m)) AS harmonic_scaled
        FROM hll_full GROUP BY 1
    ),
    hll_exact AS (
        SELECT {group_col} AS grp, COUNT(DISTINCT {key_col}) AS exact_keys
        FROM {source} GROUP BY 1
    )
    SELECT e.grp, e.exact_keys, a.nonzero_registers, a.harmonic_scaled,
        {_HLL_EST_NUM} // (1000000 * a.harmonic_scaled) AS hll_raw_est
    FROM hll_exact e JOIN hll_agg a USING (grp)
    ORDER BY grp
) hll"""


# --------------------------------------- CMS join-cardinality estimate

def join_size_cms(
    left_items: DataFrame,
    right_items: DataFrame,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Equi-join cardinality estimation from two Count-Min sketches —
    the planner statistic that decides broadcast vs shuffle vs skew
    mitigation at 100 TB WITHOUT touching the data twice: each side is
    sketched independently (mergeable, partial-aggregated, depth×width
    bounded), and |A ⋈ B| is estimated by the classic sketch inner
    product — per lane j, sum over columns of cntA·cntB; min over
    lanes. Collisions only ever ADD phantom pairs, so every lane (and
    hence the min) upper-bounds the true join size: estimate >= exact,
    always. Both the estimate and the exact count are pure integer
    functions of the data, so the oracle reproduces them bit-for-bit
    (md5 hash family, functions/hashing.py).

    Inputs are single-column ``item`` string DataFrames (the join key,
    canonically stringified). The exact count — emitted as ground truth
    — is Σ_k cntA(k)·cntB(k) over matching keys: computed from the two
    per-key count tables (shuffle bounded by DISTINCT keys, never rows).

    Output (one row): (n_left, n_right, exact_join_rows, cms_estimate,
    overestimates)."""
    ca = cms_cells(left_items, width, depth).withColumnRenamed("cnt", "cnt_a")
    cb = cms_cells(right_items, width, depth).withColumnRenamed("cnt", "cnt_b")
    lanes = (
        ca.join(cb, ["row", "col"])
        .groupBy("row")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("lane_est"))
    )
    est = lanes.agg(F.min("lane_est").alias("cms_estimate"))
    ka = left_items.groupBy("item").agg(F.count("*").alias("cnt_a"))
    kb = right_items.groupBy("item").agg(F.count("*").alias("cnt_b"))
    exact = (
        ka.join(kb, "item")
        .agg(F.coalesce(F.sum(F.col("cnt_a") * F.col("cnt_b")), F.lit(0)).alias(
            "exact_join_rows"
        ))
    )
    na = left_items.agg(F.count("*").alias("n_left"))
    nb = right_items.agg(F.count("*").alias("n_right"))
    return (
        na.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(est))
        .withColumn(
            "overestimates", F.col("cms_estimate") >= F.col("exact_join_rows")
        )
    )


def join_size_cms_sql(
    left_expr: str,
    right_expr: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> str:
    """DuckDB twin of :func:`join_size_cms`. ``left_expr`` /
    ``right_expr`` are full `SELECT <key-as-varchar> AS item FROM ...`
    subqueries."""
    from ..functions.hashing import portable_hash32_family_sql

    js = ", ".join(str(j) for j in range(depth))
    cols = ", ".join(
        f"{lane} % {width}"
        for lane in portable_hash32_family_sql("item", depth)
    )
    return f"""(
    WITH js_a AS ({left_expr}),
    js_b AS ({right_expr}),
    js_ca AS (
        SELECT j, col, COUNT(*) AS cnt_a FROM (
            SELECT unnest([{js}]) AS j, unnest([{cols}]) AS col FROM js_a
        ) pa GROUP BY 1, 2
    ),
    js_cb AS (
        SELECT j, col, COUNT(*) AS cnt_b FROM (
            SELECT unnest([{js}]) AS j, unnest([{cols}]) AS col FROM js_b
        ) pb GROUP BY 1, 2
    ),
    js_est AS (
        SELECT MIN(lane_est) AS cms_estimate FROM (
            SELECT j, SUM(cnt_a * cnt_b) AS lane_est
            FROM js_ca JOIN js_cb USING (j, col) GROUP BY 1
        )
    ),
    js_exact AS (
        SELECT COALESCE(SUM(a.cnt_a * b.cnt_b), 0) AS exact_join_rows
        FROM (SELECT item, COUNT(*) AS cnt_a FROM js_a GROUP BY 1) a
        JOIN (SELECT item, COUNT(*) AS cnt_b FROM js_b GROUP BY 1) b
            USING (item)
    )
    SELECT (SELECT COUNT(*) FROM js_a) AS n_left,
        (SELECT COUNT(*) FROM js_b) AS n_right,
        (SELECT exact_join_rows FROM js_exact) AS exact_join_rows,
        (SELECT cms_estimate FROM js_est) AS cms_estimate,
        (SELECT cms_estimate FROM js_est)
            >= (SELECT exact_join_rows FROM js_exact) AS overestimates
) js"""


# --------------------------------------- HLL set algebra (intersection)

def hll_set_intersection(
    events: DataFrame, type_a: str = "click", type_b: str = "view"
) -> DataFrame:
    """Sketch ALGEBRA on the deterministic HLL registers: |A ∪ B| comes
    free from register max-merge (the mergeable-sketch contract used by
    the streaming partials), and |A ∩ B| by inclusion-exclusion —
    estimating audience overlap between two event types WITHOUT ever
    shuffling user ids together. This is how planners and audience
    systems intersect huge sets at 100 TB: two 64-register sketches and
    five integer operations, not a join.

    The estimate column is pinned exactly by the oracle (registers and
    the integer harmonic fold are bit-reproducible); the exact
    intersection rides along by inclusion-exclusion on exact distinct
    counts for honesty about the sketch's error."""
    ev = events.filter(F.col("event_type").isin(type_a, type_b)).select(
        "event_type", "user_id"
    )
    # Share-the-scan variants measured and REJECTED (optimization r11):
    # deduplicating (event_type, user_id) once and deriving registers +
    # exact counts from the pair table is the textbook rewrite (the
    # corpus is evaluated 4× below), but materializing the shared pair
    # table costs more than the redundant scans at any scale where this
    # digest query is cheap — localCheckpoint(eager) measured 0.89 s
    # min-of-3 vs 0.59 s for the 4-scan form at sf0.1, and .persist()
    # (racy multi-materialization across the three consumer subtrees in
    # one action) 2.17 s. The 4 evaluations are each partial-aggregated
    # scans with group-bounded shuffles, so the redundancy is scan-bound
    # and embarrassingly parallel; the hll_estimate fill-join rewrite
    # (one aggregate, no crossJoin/fill series) is where the real win
    # was.
    reg = hll_registers(ev, "event_type", "user_id")
    union_reg = (
        reg.groupBy("bucket")
        .agg(F.max("m").alias("m"))
        .select(F.lit("union").alias("grp"), "bucket", "m")
    )
    all_reg = reg.unionByName(union_reg)
    exact = (
        ev.groupBy(F.col("event_type").alias("grp"))
        .agg(F.count_distinct("user_id").alias("exact_keys"))
        .unionByName(
            ev.select(F.lit("union").alias("grp"), "user_id")
            .groupBy("grp")
            .agg(F.count_distinct("user_id").alias("exact_keys"))
        )
    )
    est = hll_estimate(all_reg, exact)

    def pick(col: str, grp: str):
        return F.max(F.when(F.col("grp") == grp, F.col(col)))

    one = est.groupBy().agg(
        pick("hll_raw_est", type_a).alias("est_a"),
        pick("hll_raw_est", type_b).alias("est_b"),
        pick("hll_raw_est", "union").alias("est_union"),
        pick("exact_keys", type_a).alias("exact_a"),
        pick("exact_keys", type_b).alias("exact_b"),
        pick("exact_keys", "union").alias("exact_union"),
    )
    return one.select(
        "est_a",
        "est_b",
        "est_union",
        (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
            "est_intersection"
        ),
        (F.col("exact_a") + F.col("exact_b") - F.col("exact_union")).alias(
            "exact_intersection"
        ),
    )


def hll_set_intersection_sql(
    source: str = "events", type_a: str = "click", type_b: str = "view"
) -> str:
    from ..functions.hashing import portable_hash32_sql

    h = portable_hash32_sql("CAST(user_id AS VARCHAR)")
    return f"""(
    WITH hsi_ev AS (
        SELECT event_type, user_id FROM {source}
        WHERE event_type IN ('{type_a}', '{type_b}')
    ),
    hsi_rho AS (
        SELECT event_type AS grp, h % {HLL_M} AS bucket,
            {HLL_RHO_MAX} - (CASE WHEN h // {HLL_M} = 0 THEN 0
                ELSE length(bin(h // {HLL_M})) END) AS rho
        FROM (SELECT event_type, {h} AS h FROM hsi_ev)
    ),
    hsi_reg AS (
        SELECT grp, bucket, MAX(rho) AS m FROM hsi_rho GROUP BY 1, 2
    ),
    hsi_all AS (
        SELECT grp, bucket, m FROM hsi_reg
        UNION ALL
        SELECT 'union' AS grp, bucket, MAX(m) AS m FROM hsi_reg GROUP BY 2
    ),
    hsi_full AS (
        SELECT g.grp, b.bucket, COALESCE(r.m, 0) AS m
        FROM (SELECT DISTINCT grp FROM hsi_all) g
        CROSS JOIN (SELECT unnest(generate_series(0, {HLL_M - 1})) AS bucket) b
        LEFT JOIN hsi_all r ON r.grp = g.grp AND r.bucket = b.bucket
    ),
    hsi_est AS (
        SELECT grp,
            {_HLL_EST_NUM} // (1000000 *
                SUM(1::BIGINT << ({HLL_RHO_MAX} - m))) AS hll_raw_est
        FROM hsi_full GROUP BY 1
    ),
    hsi_exact AS (
        SELECT event_type AS grp, COUNT(DISTINCT user_id) AS exact_keys
        FROM hsi_ev GROUP BY 1
        UNION ALL
        SELECT 'union', COUNT(DISTINCT user_id) FROM hsi_ev
    ),
    hsi_one AS (
        SELECT
            MAX(CASE WHEN e.grp = '{type_a}' THEN e.hll_raw_est END) AS est_a,
            MAX(CASE WHEN e.grp = '{type_b}' THEN e.hll_raw_est END) AS est_b,
            MAX(CASE WHEN e.grp = 'union' THEN e.hll_raw_est END) AS est_union,
            MAX(CASE WHEN x.grp = '{type_a}' THEN x.exact_keys END) AS exact_a,
            MAX(CASE WHEN x.grp = '{type_b}' THEN x.exact_keys END) AS exact_b,
            MAX(CASE WHEN x.grp = 'union' THEN x.exact_keys END) AS exact_union
        FROM hsi_est e JOIN hsi_exact x USING (grp)
    )
    SELECT est_a, est_b, est_union,
        est_a + est_b - est_union AS est_intersection,
        exact_a + exact_b - exact_union AS exact_intersection
    FROM hsi_one
) hsi"""
