"""Plan-shape and error-bound assertions for the analytics surface
(plans/analytics.py) — value parity is covered by the registry-wide
oracle test; these pin the physical properties that matter at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_temp_data_pipeline_spark.plans.analytics import (
    approx_distinct_users,
    customer_order_windows,
    nation_priority_pivot,
    revenue_rollup,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pivot_is_single_pass(spark, sf_dir):
    """Explicit-value pivot = conditional aggregation: ONE scan of
    orders, one agg pair (partial+final) — not one job per priority."""
    plan = _plan(nation_priority_pivot(spark, sf_dir))
    assert plan.count("Scan parquet") == 2  # orders + customer, once each
    assert "Expand" not in plan  # pivot must not expand rows


def test_rollup_is_one_expand_pass(spark, sf_dir):
    """ROLLUP = one Expand (3 grouping sets) over one scan — never a
    union of per-level aggregations."""
    plan = _plan(revenue_rollup(spark, sf_dir))
    assert plan.count("Scan parquet") == 1
    assert plan.count("Expand") == 1


def test_window_suite_single_sort(spark, sf_dir):
    """All ten window functions share one window spec → exactly one
    exchange and one sort (the running-sum ROWS frame reuses them)."""
    plan = _plan(customer_order_windows(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Sort ") <= 2  # one physical sort (+1 AQE variant slack)


def test_hll_error_bound(spark, sf_dir):
    rows = approx_distinct_users(spark, sf_dir).collect()
    assert rows and all(r.hll_within_2pct for r in rows)


def test_histogram_quantile_bound(spark, sf_dir):
    """Deterministic sketch contract: for every q the estimate is the
    lower edge of the bin holding the true q-quantile, so
    est <= exact < est + width."""
    import math

    from iot_temp_data_pipeline_spark.operators.sketches import (
        HIST_WIDTH_CENTS,
        histogram_quantiles,
    )
    from iot_temp_data_pipeline_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    cents = sorted(
        r[0]
        for r in li.select(
            F.round(F.col("l_extendedprice") * 100).cast("long")
        ).collect()
    )
    rows = histogram_quantiles(li).collect()
    assert {r["q"] for r in rows} == {25, 50, 75, 90, 99}
    for r in rows:
        exact = cents[math.ceil(r["q"] * len(cents) / 100) - 1]
        assert r["est_cents"] <= exact < r["est_cents"] + HIST_WIDTH_CENTS


def test_cms_never_underestimates(spark, sf_dir):
    """Count-Min's one-sided guarantee: estimate >= true count, always
    (collisions only ADD mass). Exact estimate values are hash-pinned by
    the DuckDB oracle; this pins the sketch's statistical contract."""
    from iot_temp_data_pipeline_spark.plans.registry import REGISTRY

    rows = REGISTRY["cms_frequency_check"].spark(spark, sf_dir).collect()
    assert rows and all(r.cms_estimate >= r.true_count for r in rows)


def test_connected_components_chain_and_pair(spark):
    """Min-label propagation: a 5-node path (diameter 4 — forces
    multiple rounds), an isolated pair, and a triangle all collapse to
    their min id."""
    from iot_temp_data_pipeline_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_connected_components_star_long_chain(spark):
    """Large-star/small-star contraction (Kiveris et al. SoCC'14): a
    1000-node path — diameter 999, the adversarial case for min-label
    propagation — must collapse to component-min 0 in O(log n) rounds,
    not O(diameter)."""
    from iot_temp_data_pipeline_spark.operators.dedup import (
        connected_components_star,
    )

    n = 1000
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components_star(edges).collect()
    }
    assert got == {(i, 0) for i in range(n + 1)}
    assert connected_components_star.last_rounds <= 12  # ~log2(1000) + slack


def test_connected_components_star_matches_propagation(spark):
    """Both CC algorithms reach the same fixpoint on a mixed graph."""
    from iot_temp_data_pipeline_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    a = {(r["doc_id"], r["cluster_id"]) for r in connected_components(edges).collect()}
    b = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components_star(edges).collect()
    }
    assert a == b


def test_winsorize_bounds_and_counts(spark, sf_dir):
    """Winsorization invariants: lo <= hi, and each clipped tail holds
    at most the percentile mass its cut targets (ceil-rank rule)."""
    from iot_temp_data_pipeline_spark.operators.profiling import winsorize_values
    from iot_temp_data_pipeline_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = winsorize_values(ev).collect()
    assert rows
    for r in rows:
        assert r["lo_cents"] <= r["hi_cents"]
        # ceil(p*n/100) rule: at most p% of rows strictly below the cut
        assert r["clipped_lo"] <= (r["n"] * 1 + 99) // 100
        assert r["clipped_hi"] <= r["n"] - (r["n"] * 99 + 99) // 100 + 1


def test_key_skew_permille_sane(spark, sf_dir):
    """Skew profile invariants: top1 <= topn <= 1000 permille; hottest
    key accounts for exactly top1 share; key count never exceeds rows."""
    from iot_temp_data_pipeline_spark.operators.profiling import key_skew_diagnostics
    from iot_temp_data_pipeline_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    for r in key_skew_diagnostics(ev).collect():
        assert 0 < r["top1_permille"] <= r["topn_permille"] <= 1000
        assert r["n_keys"] <= r["n_rows"]
        assert r["max_key_rows"] >= r["top1_permille"] * r["n_rows"] // 1000


def test_drift_identical_cohorts_zero(spark):
    """A distribution compared against itself drifts zero: build a
    symmetric frame where both time halves hold identical values, so
    every bin's ppm shares match and chi2_ppm == 0."""
    import datetime

    from iot_temp_data_pipeline_spark.operators.profiling import value_drift_chi2

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for half in (0, 1):
        for i in range(50):
            rows.append(
                (
                    i,
                    base + datetime.timedelta(hours=half * 100 + i),
                    1,
                    "t",
                    float(i % 7) * 10.0,
                    "{}",
                )
            )
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = value_drift_chi2(ev).collect()
    assert len(out) == 1
    assert out[0]["chi2_ppm"] == 0
    assert out[0]["n_ref"] == out[0]["n_cur"] == 50


def test_join_size_cms_upper_bound_under_skew(spark):
    """CMS join-size estimate must upper-bound the true join size even
    under heavy key skew (one hot key on both sides — the case where
    sampling-based estimators fail worst)."""
    from iot_temp_data_pipeline_spark.operators.sketches import join_size_cms

    left = spark.createDataFrame(
        [("hot",)] * 500 + [(f"l{i}",) for i in range(200)], "item string"
    )
    right = spark.createDataFrame(
        [("hot",)] * 300 + [(f"r{i}",) for i in range(100)], "item string"
    )
    row = join_size_cms(left, right).collect()[0]
    assert row["exact_join_rows"] == 500 * 300
    assert row["overestimates"]
    assert row["cms_estimate"] >= row["exact_join_rows"]


def test_embedding_drift_zero_for_mirrored_cohorts(spark):
    """Identity check on the drift algebra: if the second cohort is an
    exact copy of the first (same per-label vectors), every label's
    centroid drift must be exactly 0 — and a shifted copy must not be."""
    from iot_temp_data_pipeline_spark.operators.profiling import (
        EMB_DRIFT_DIM,
        embedding_drift,
    )

    base = [[float(i % 7) / 7.0 - 0.4] * EMB_DRIFT_DIM for i in range(6)]
    rows = [(i, base[i], i % 2) for i in range(6)]  # first cohort: ids 0-5
    rows += [(10 + i, base[i], i % 2) for i in range(6)]  # mirrored copy
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r["label"]: r for r in embedding_drift(emb).collect()}
    assert set(out) == {0, 1}
    for r in out.values():
        assert r["drift_q2"] == 0 and r["n_first"] == r["n_second"] == 3

    shifted = [(10 + i, [x + 0.1 for x in base[i]], i % 2) for i in range(6)]
    emb2 = spark.createDataFrame(
        rows[:6] + shifted, "vec_id long, embedding array<float>, label int"
    )
    out2 = embedding_drift(emb2).collect()
    assert all(r["drift_q2"] > 0 for r in out2)


def test_curriculum_phases_partition_corpus_with_disjoint_spans(spark, sf_dir):
    """Phases 1..4 partition the corpus (counts sum to |docs|), and
    because assignment is bin-granular, score spans are strictly
    disjoint and increasing across phases."""
    from iot_temp_data_pipeline_spark.operators.quality import curriculum_phases
    from iot_temp_data_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = sorted(curriculum_phases(docs).collect(), key=lambda r: r["phase"])
    assert [r["phase"] for r in rows] == [1, 2, 3, 4]
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for a, b in zip(rows, rows[1:]):
        assert a["max_score_milli"] < b["min_score_milli"]


def test_time_weighted_avg_locf_integral(spark, tmp_path):
    """TWA on crafted irregular samples: value 10 held 9 s then value
    100 held 1 s -> integral (10*9 + 100*1)/10 = 19, while plain avg
    would say 55 (burst bias). Built through a parquet round-trip so
    the query path (load_table) is exercised end-to-end."""
    import datetime

    from iot_temp_data_pipeline_spark.plans.timeseries import time_weighted_avg

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "steady", 0.010, "{}"),
        (2, t0 + datetime.timedelta(seconds=9), 7, "steady", 0.100, "{}"),
        (3, t0 + datetime.timedelta(seconds=10), 7, "steady", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "twa_sf")  # only events is read by this query
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = {r["event_type"]: r for r in time_weighted_avg(spark, sf).collect()}
    r = out["steady"]
    assert r["span_s"] == 10
    assert r["twa_milli"] == 19  # (10*9 + 100*1) / 10 milli-units
    assert r["n_events"] == 3


def test_mad_gate_flags_tail_not_bulk(spark):
    """MAD contract on a crafted heavy tail: 98 values at 1.00, one at
    1.02, one at 99.00 -> median 100 cents, MAD 0, and ONLY the two
    off-median points are flagged (with MAD=0 any deviation trips the
    modified z rule); the bulk never flags. Mean/stddev z-scores would
    let the 99.00 point drag the threshold."""
    from iot_temp_data_pipeline_spark.operators.profiling import mad_outlier_gate

    rows = [(i, "t", 1.00) for i in range(98)] + [
        (98, "t", 1.02),
        (99, "t", 99.00),
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    r = mad_outlier_gate(df).collect()[0]
    assert r["median_cents"] == 100
    assert r["mad_cents"] == 0
    assert r["n_outliers"] == 2
    assert r["outlier_permille"] == 20
