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
    e*N/width with probability 1 - exp(-depth) per item."""
    items = docs.select(F.explode(tokens(F.col("text"))).alias("item"))
    return cms_estimates(items, cms_cells(items, width, depth), width, depth, topn)


def _cms_positions(width: int, depth: int):
    from ..functions.hashing import portable_hash32

    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("row"),
                    (F.pmod(portable_hash32(F.col("item"), seed=j), width)).alias(
                        "col"
                    ),
                )
                for j in range(depth)
            ]
        )
    )


def cms_cells(
    items: DataFrame, width: int = CMS_WIDTH, depth: int = CMS_DEPTH
) -> DataFrame:
    """The sketch itself: (row, col, cnt) cell counts for an ``item``
    column. Pure function of the multiset of items — mergeable across
    partitions, batches, or streams by summing cnt per cell."""
    return (
        items.select(_cms_positions(width, depth).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
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
    probes = exact_top.select(
        "item", "true_count", _cms_positions(width, depth).alias("p")
    ).select(
        "item", "true_count", F.col("p.row").alias("row"), F.col("p.col").alias("col")
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
    """DuckDB twin: rebuilds the identical sketch (same md5 hash family,
    same width/depth) and recomputes every estimate exactly."""
    from ..functions.hashing import portable_hash32_sql

    lanes = ", ".join(str(j) for j in range(depth))
    h = portable_hash32_sql("item", seed=0).replace("'0:'", "j || ':'")
    return f"""(
    WITH cms_items AS (
        SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS item
        FROM {source}
    ),
    cms_lanes AS (SELECT unnest([{lanes}]) AS j),
    cms_cells AS (
        SELECT j, {h} % {width} AS col, COUNT(*) AS cnt
        FROM cms_items CROSS JOIN cms_lanes
        GROUP BY 1, 2
    ),
    cms_top AS (
        SELECT item, COUNT(*) AS true_count FROM cms_items
        GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT {topn}
    ),
    cms_probes AS (
        SELECT item, true_count, j, {h} % {width} AS col
        FROM cms_top CROSS JOIN cms_lanes
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
