"""Data-mixture token-budget solver (beyond-reference surface): given
per-domain target weights and a global token budget, compute how many
tokens to draw from each domain, respecting each domain's availability
— the allocation step every LLM pre-training data recipe runs before
sampling (the "mixture weights" table of a training run).

Semantics — capped waterfilling, the standard allocation rule:

- each domain d has ``avail_d`` tokens (whitespace tokens, the same
  tokenizer as text_stats) and an integer preference weight ``w_d``;
- the budget ``B`` (a fixed fraction of total corpus tokens) is split
  pro-rata by weight, but a domain is never allocated more than it has
  (epoch cap 1.0 — no upsampling);
- domains whose pro-rata ask exceeds their availability FREEZE at
  ``avail_d`` and their unused ask is redistributed pro-rata among the
  unfrozen domains — repeated for a FIXED number of rounds (2 freeze
  rounds + final assignment), which is exact whenever at most two
  "waterline" levels bind (and deterministic always).

Everything is integer arithmetic: ``(w·R) // W`` floor division, so
DuckDB reproduces every allocation bit-for-bit. Weights come from a
deterministic rule on the source name (numeric suffix % 5 + 1) rather
than a config file, so the oracle needs no side channel.

Execution shape: one groupBy(source) over the corpus (map-side combined
to |domains| rows), then three 1-row broadcast cross joins carrying the
scalar state (B, W, R2, W2, R3, W3) — the J1 pattern; nothing leaves
the JVM and nothing is collected. At 100 TB the only corpus-sized pass
is the first aggregation.

Cited parity anchor: reference has no mixture surface; extends the
training-data brief (SURVEY.md §2 extension block — sampling weights /
domain capping family, see operators/quality.py domain caps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import token_count, tokens
from ..sources.catalog import load_table

BUDGET_NUM = 7   # budget = 7/10 of total corpus tokens
BUDGET_DEN = 10
N_WEIGHT_CLASSES = 5  # w_d = (numeric suffix of source) % 5 + 1


def _weight(source: F.Column) -> F.Column:
    suffix = F.substring(source, 4, 10).cast("long")
    return (suffix % N_WEIGHT_CLASSES + 1).cast("long")


def mixture_token_budget(docs: DataFrame) -> DataFrame:
    """(source, weight, avail_tokens, alloc_tokens, frozen_round,
    utilization_pct): the per-domain sampling plan. frozen_round = 1 or
    2 when the domain's availability bound, 0 when it received its
    final pro-rata share."""
    avail = (
        docs.select(
            "source", F.size(tokens(F.col("text"))).cast("long").alias("nt")
        )
        .groupBy("source")
        .agg(F.sum("nt").alias("avail"))
        .withColumn("w", _weight(F.col("source")))
    )
    tot = avail.agg(
        F.sum("avail").alias("total"), F.sum("w").alias("w_all")
    ).select(
        F.expr(f"(total * {BUDGET_NUM}) div {BUDGET_DEN}").alias("budget"),
        "w_all",
    )
    r1 = avail.crossJoin(F.broadcast(tot)).withColumn(
        "frozen1",
        F.expr("(w * budget) div w_all") >= F.col("avail"),
    )
    s2 = r1.agg(
        F.first("budget").alias("budget"),
        F.sum(F.when(F.col("frozen1"), F.col("avail")).otherwise(0)).alias(
            "taken1"
        ),
        F.sum(F.when(F.col("frozen1"), 0).otherwise(F.col("w"))).alias("w2"),
    ).select(
        (F.col("budget") - F.col("taken1")).alias("r2"), "w2"
    )
    r2 = r1.crossJoin(F.broadcast(s2)).withColumn(
        "frozen2",
        (~F.col("frozen1")) & (F.expr("(w * r2) div w2") >= F.col("avail")),
    )
    s3 = r2.agg(
        F.first("r2").alias("r2x"),
        F.sum(F.when(F.col("frozen2"), F.col("avail")).otherwise(0)).alias(
            "taken2"
        ),
        F.sum(
            F.when(F.col("frozen1") | F.col("frozen2"), 0).otherwise(F.col("w"))
        ).alias("w3"),
    ).select((F.col("r2x") - F.col("taken2")).alias("r3"), "w3")
    final = r2.crossJoin(F.broadcast(s3)).withColumn(
        "alloc",
        F.when(F.col("frozen1") | F.col("frozen2"), F.col("avail")).otherwise(
            F.least(F.col("avail"), F.expr("(w * r3) div w3"))
        ),
    )
    return final.select(
        "source",
        F.col("w").alias("weight"),
        F.col("avail").alias("avail_tokens"),
        F.col("alloc").alias("alloc_tokens"),
        F.when(F.col("frozen1"), 1)
        .when(F.col("frozen2"), 2)
        .otherwise(0)
        .cast("long")
        .alias("frozen_round"),
        F.round(
            F.col("alloc").cast("double") / F.col("avail").cast("double") * 100,
            4,
        ).alias("utilization_pct"),
    ).orderBy("source")


# Integer-division parity note: Spark ``div`` and DuckDB ``//`` are both
# exact integer division truncating toward zero; every operand here is
# non-negative, so both equal mathematical floor — no float in the
# allocation path.
def mixture_token_budget_sql(docs_table: str = "documents") -> str:
    w = f"(CAST(SUBSTR(source, 4) AS BIGINT) % {N_WEIGHT_CLASSES} + 1)"
    return f"""(
    WITH avail AS (
        SELECT source,
            SUM(len(regexp_split_to_array(lower(text), '\\s+'))) AS avail,
            {w} AS w
        FROM {docs_table}
        GROUP BY source
    ),
    tot AS (
        SELECT (SUM(avail) * {BUDGET_NUM}) // {BUDGET_DEN} AS budget,
               SUM(w) AS w_all
        FROM avail
    ),
    r1 AS (
        SELECT a.*, t.budget,
               (a.w * t.budget) // t.w_all >= a.avail AS frozen1
        FROM avail a CROSS JOIN tot t
    ),
    s2 AS (
        SELECT ANY_VALUE(budget)
                 - SUM(CASE WHEN frozen1 THEN avail ELSE 0 END) AS r2,
               SUM(CASE WHEN frozen1 THEN 0 ELSE w END) AS w2
        FROM r1
    ),
    r2 AS (
        SELECT r1.*, s2.r2 AS rem2, s2.w2,
               NOT frozen1 AND (w * s2.r2) // s2.w2 >= avail AS frozen2
        FROM r1 CROSS JOIN s2
    ),
    s3 AS (
        SELECT ANY_VALUE(rem2) - SUM(CASE WHEN frozen2 THEN avail ELSE 0 END) AS r3,
               SUM(CASE WHEN frozen1 OR frozen2 THEN 0 ELSE w END) AS w3
        FROM r2
    )
    SELECT r2.source,
           r2.w AS weight,
           r2.avail AS avail_tokens,
           CASE WHEN frozen1 OR frozen2 THEN avail
                ELSE LEAST(avail, (w * s3.r3) // s3.w3) END AS alloc_tokens,
           CASE WHEN frozen1 THEN 1 WHEN frozen2 THEN 2 ELSE 0 END
               AS frozen_round,
           ROUND(CAST(CASE WHEN frozen1 OR frozen2 THEN avail
                      ELSE LEAST(avail, (w * s3.r3) // s3.w3) END AS DOUBLE)
                 / CAST(avail AS DOUBLE) * 100, 4) AS utilization_pct
    FROM r2 CROSS JOIN s3
    ORDER BY source
) s"""


# ----------------------------------------- temperature-scaled weights

# α = 1/2: w_d ∝ n_d^(1/2) — the sampling-temperature exponent family
# (multilingual pretraining's exponent-smoothed sampling, mBERT/XLM-R
# τ≈0.5-0.7; T5's α-temperature mixture). 1/2 is the one exponent with
# an EXACT cross-engine form: IEEE-754 sqrt is correctly rounded, so
# floor(sqrt(n)) of the same BIGINT is bit-identical in Spark and
# DuckDB — no libm pow anywhere (the _pow2_col discipline, inverted).
PPM = 1_000_000


def mixture_temperature_weights(docs: DataFrame) -> DataFrame:
    """Per-source temperature-scaled sampling weights: the standard
    fix for heavy-tailed source distributions — proportional sampling
    starves small sources, uniform oversamples them; w_d = ⌊√n_d⌋
    damps giants and boosts the tail. Output per source: n_tokens,
    share_ppm (proportional), weight, weight_ppm (temperature), and
    boost_permille = 1000·weight_share/proportional_share (>1000 ⇔
    the source is upweighted by the temperature).

    Shape: one map-side-combined groupBy(source) over the corpus, a
    1-row totals digest broadcast back (the J1 pattern) and a pure
    projection — the only corpus-sized pass is the first aggregate."""
    per = (
        docs.select("source", token_count(F.col("text")).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("n_tokens"))
        .withColumn(
            "weight",
            F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("long"),
        )
    )
    tot = per.agg(
        F.sum("n_tokens").alias("tot_tokens"), F.sum("weight").alias("tot_w")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            F.expr(f"div({PPM} * n_tokens, tot_tokens)").alias("share_ppm"),
            "weight",
            F.expr(f"div({PPM} * weight, tot_w)").alias("weight_ppm"),
            # greatest(…, 1): a source holding under 1 ppm of corpus
            # tokens floors share_ppm to 0 — guard the denominator in
            # BOTH engines (ADVICE r9) so the long column never goes
            # NULL; such a source reads as "boosted vs a 1 ppm share".
            F.expr(
                f"div(1000 * div({PPM} * weight, tot_w),"
                f" greatest(div({PPM} * n_tokens, tot_tokens), 1))"
            ).alias("boost_permille"),
        )
    )


def mixture_temperature_weights_sql(docs_table: str = "documents") -> str:
    return f"""(
    WITH mtw AS (
        SELECT source, SUM(len(regexp_split_to_array(lower(text), '\\s+')))
            AS n_tokens
        FROM {docs_table}
        GROUP BY source
    ),
    mtw_w AS (
        SELECT source, n_tokens,
            CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS weight
        FROM mtw
    ),
    mtw_tot AS (
        SELECT SUM(n_tokens) AS tot_tokens, SUM(weight) AS tot_w FROM mtw_w
    )
    SELECT source, n_tokens,
        ({PPM} * n_tokens) // tot_tokens AS share_ppm,
        weight,
        ({PPM} * weight) // tot_w AS weight_ppm,
        (1000 * (({PPM} * weight) // tot_w))
            // GREATEST(({PPM} * n_tokens) // tot_tokens, 1) AS boost_permille
    FROM mtw_w CROSS JOIN mtw_tot
) s"""


# ------------------------------------- largest-remainder apportionment

HAMILTON_K = 10_000  # total samples to apportion across sources


def stratified_allocation_hamilton(
    docs: DataFrame, k: int = HAMILTON_K
) -> DataFrame:
    """Exact proportional sample allocation by the largest-remainder
    (Hamilton) method: each source gets ⌊k·n_d/N⌋ samples, and the
    k − Σ floors leftover seats go to the largest fractional
    remainders (ties → source name ascending, pinned). The apportionment
    rule every stratified sampler needs once sample counts must be
    INTEGERS that sum exactly to k — naive rounding over- or
    under-shoots.

    All integer arithmetic: remainder comparison uses k·n_d mod N
    directly (ordering by the modular residue IS ordering by the
    fractional part — no doubles anywhere). One corpus groupBy, a
    1-row totals digest broadcast back, and one window over |sources|
    rows (bounded by the stratum count, never the corpus)."""
    per = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = per.agg(F.sum("n_docs").alias("n_total"))
    base = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_total",
        F.expr(f"div({k} * n_docs, n_total)").alias("base_alloc"),
        (F.lit(k) * F.col("n_docs") % F.col("n_total")).alias("residue"),
    )
    wrank = Window.orderBy(F.col("residue").desc(), F.col("source"))
    wtot = Window.partitionBy()
    return (
        base.withColumn("rnk", F.row_number().over(wrank))
        .withColumn("leftover", F.lit(k) - F.sum("base_alloc").over(wtot))
        .select(
            "source",
            "n_docs",
            F.col("base_alloc").cast("long").alias("base_alloc"),
            F.col("residue").cast("long").alias("residue"),
            (F.col("rnk") <= F.col("leftover")).alias("got_topup"),
            (
                F.col("base_alloc")
                + (F.col("rnk") <= F.col("leftover")).cast("long")
            ).cast("long").alias("final_alloc"),
        )
    )


def stratified_allocation_hamilton_sql(
    docs_table: str = "documents", k: int = HAMILTON_K
) -> str:
    return f"""(
    WITH ha_per AS (
        SELECT source, COUNT(*) AS n_docs FROM {docs_table} GROUP BY source
    ),
    ha_tot AS (SELECT SUM(n_docs) AS n_total FROM ha_per),
    ha_base AS (
        SELECT source, n_docs, n_total,
            ({k} * n_docs) // n_total AS base_alloc,
            ({k} * n_docs) % n_total AS residue
        FROM ha_per CROSS JOIN ha_tot
    ),
    ha_rank AS (
        SELECT *,
            ROW_NUMBER() OVER (ORDER BY residue DESC, source) AS rnk,
            {k} - SUM(base_alloc) OVER () AS leftover
        FROM ha_base
    )
    SELECT source, n_docs,
        CAST(base_alloc AS BIGINT) AS base_alloc,
        CAST(residue AS BIGINT) AS residue,
        rnk <= leftover AS got_topup,
        CAST(base_alloc + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END
             AS BIGINT) AS final_alloc
    FROM ha_rank
) s"""


# --------------------------------------- UniMax budget allocation

UNIMAX_EPOCH_CAP = 4  # max epochs any source may repeat


def mixture_unimax_allocation(
    docs: DataFrame, epoch_cap: int = UNIMAX_EPOCH_CAP
) -> DataFrame:
    """UniMax sampling allocation (Chung et al., "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining", ICLR 2023): spread the token budget B as UNIFORMLY
    as possible across sources, but cap every source at ``epoch_cap``
    epochs of its own corpus (cap_d = epoch_cap·n_d) — the published
    alternative to temperature sampling that bounds repetition of
    small sources instead of merely damping giants.

    Exact integer waterfilling: sources ascending by cap; source k is
    CAPPED iff giving every remaining source its cap_k is affordable
    (cap_k·(N−k+1) ≤ B − prefix_{k−1} — the capped set is a prefix of
    the cap order); uncapped sources share the residual budget as
    L = (B−ΣcapK) div (N−K) with the mod-remainder distributed +1 to
    the first R uncapped sources in the same order (the Hamilton
    largest-remainder discipline; Σ allocated == min(B, Σcap)
    exactly, and allocated ≤ cap row-wise — L < cap_first_uncapped by
    the capping predicate). B is half the corpus's total tokens (a
    1-row digest broadcast back), so both branches are exercised.

    Plan: one map-side-combined corpus groupBy, a broadcast totals
    digest, and windows over |sources| rows — bounded by the stratum
    count, never the corpus (the Hamilton shape)."""
    per = (
        docs.select("source", token_count(F.col("text")).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("n_tokens"))
        .withColumn("cap_tokens", F.lit(epoch_cap) * F.col("n_tokens"))
    )
    tot = per.agg(
        F.expr("div(sum(n_tokens), 2)").alias("budget"),
        F.count("*").alias("n_src"),
    )
    w = Window.orderBy(F.col("cap_tokens"), F.col("source"))
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    staged = (
        per.crossJoin(F.broadcast(tot))
        .withColumn("k", F.row_number().over(w))
        .withColumn("prefix_prev", F.sum("cap_tokens").over(wcum) - F.col("cap_tokens"))
        .withColumn(
            "capped",
            F.col("cap_tokens") * (F.col("n_src") - F.col("k") + 1)
            <= F.col("budget") - F.col("prefix_prev"),
        )
        .withColumn(
            "capped_total",
            F.sum(F.when(F.col("capped"), F.col("cap_tokens")).otherwise(0)).over(wall),
        )
        .withColumn("n_capped", F.sum(F.col("capped").cast("long")).over(wall))
    )
    n_unc = F.col("n_src") - F.col("n_capped")
    level = F.expr("div(budget - capped_total, n_src - n_capped)")
    leftover = (F.col("budget") - F.col("capped_total")) % n_unc
    return staged.select(
        "source",
        "n_tokens",
        "cap_tokens",
        F.when(F.col("capped"), F.col("cap_tokens"))
        .otherwise(
            level
            + ((F.col("k") - F.col("n_capped")) <= leftover).cast("long")
        )
        .cast("long")
        .alias("allocated_tokens"),
        "capped",
        F.expr(
            "div(1000 * (CASE WHEN capped THEN cap_tokens ELSE "
            "div(budget - capped_total, n_src - n_capped) "
            "+ (CASE WHEN k - n_capped <= "
            "(budget - capped_total) % (n_src - n_capped) "
            "THEN 1 ELSE 0 END) END), n_tokens)"
        ).alias("epochs_permille"),
    )


def mixture_unimax_allocation_sql(
    docs_table: str = "documents", epoch_cap: int = UNIMAX_EPOCH_CAP
) -> str:
    return f"""(
    WITH um_per AS (
        SELECT source,
            SUM(len(regexp_split_to_array(lower(text), '\\s+'))) AS n_tokens
        FROM {docs_table} GROUP BY source
    ),
    um_cap AS (
        SELECT source, n_tokens, {epoch_cap} * n_tokens AS cap_tokens
        FROM um_per
    ),
    um_tot AS (
        SELECT SUM(n_tokens) // 2 AS budget, COUNT(*) AS n_src FROM um_cap
    ),
    um_staged AS (
        SELECT *,
            ROW_NUMBER() OVER (ORDER BY cap_tokens, source) AS k,
            SUM(cap_tokens) OVER (ORDER BY cap_tokens, source
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - cap_tokens AS prefix_prev
        FROM um_cap CROSS JOIN um_tot
    ),
    um_flag AS (
        SELECT *,
            cap_tokens * (n_src - k + 1) <= budget - prefix_prev AS capped
        FROM um_staged
    ),
    um_agg AS (
        SELECT *,
            SUM(CASE WHEN capped THEN cap_tokens ELSE 0 END) OVER ()
                AS capped_total,
            SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS n_capped
        FROM um_flag
    )
    SELECT source, n_tokens, cap_tokens,
        CAST(CASE WHEN capped THEN cap_tokens
             ELSE (budget - capped_total) // (n_src - n_capped)
                  + (CASE WHEN k - n_capped <=
                      (budget - capped_total) % (n_src - n_capped)
                     THEN 1 ELSE 0 END)
        END AS BIGINT) AS allocated_tokens,
        capped,
        (1000 * (CASE WHEN capped THEN cap_tokens
             ELSE (budget - capped_total) // (n_src - n_capped)
                  + (CASE WHEN k - n_capped <=
                      (budget - capped_total) % (n_src - n_capped)
                     THEN 1 ELSE 0 END)
        END)) // n_tokens AS epochs_permille
    FROM um_agg
) s"""
