"""Physical-plan regression tests: the plans we designed for must stay.

A correct result from a bad plan is a latent 100-TB failure; these tests
pin the plan properties the scale design depends on (SURVEY.md §4):
broadcast joins for small sides, predicate/column pushdown into scans,
and zero row-at-a-time Python (BatchEvalPython) anywhere.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as em

SF_DIR = "/root/testdata/sf0.001"

ALL_QUERIES = sorted(em.queries())


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_no_row_at_a_time_python(spark, name):
    """Every contract query must avoid BatchEvalPython (row-wise Python);
    ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas are the only
    sanctioned Python operators (vectorized)."""
    df = em.queries()[name](spark, SF_DIR)
    assert "BatchEvalPython" not in plan_of(df), name


def test_query_term_join_broadcasts(spark):
    plan = plan_of(em.queries()["fulltext_bm25_topk"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # the big postings side must NOT be broadcast: no broadcast exchange
    # feeding from the exploded-token aggregate; cheap sanity: at least
    # one shuffle exchange remains for the groupBy
    assert "Exchange hashpartitioning" in plan


def test_dim_joins_broadcast(spark):
    for name in ("rel_lookup_join", "rel_multihop_join"):
        plan = plan_of(em.queries()[name](spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, f"{name}: dim join degraded to SMJ"


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(em.queries()["rel_filter_predicates"](spark, SF_DIR))
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_quantity)" in plan or "GreaterThan" in plan


def test_column_pruning_in_scan(spark):
    """doclen query reads only (doc_id, text) — never lang/source/n_chars."""
    plan = plan_of(em.queries()["fulltext_doclen"](spark, SF_DIR))
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "n_chars" not in read_schema and "source" not in read_schema


def test_query_paths_leave_no_cache_entries(spark):
    """The pinned intermediates in the exhaustive/MLT/fuzzy/search_after
    paths must use GC-released localCheckpoint, never bare .cache():
    CacheManager entries persist until an explicit unpersist, so a
    long-lived query service would accumulate executor storage with
    every call (VERDICT r5 #4). The WAND path's cache is exempt — it
    unpersists in a finally, which this assertion also verifies."""
    spark.catalog.clearCache()
    for name in ("fulltext_bm25_topk", "fulltext_fuzzy",
                 "fulltext_more_like_this", "fulltext_search_after",
                 "fulltext_bm25_wand"):
        em.queries()[name](spark, SF_DIR).count()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "query path left entries in the CacheManager")


def test_segment_scan_prunes_term_and_bucket(spark, tmp_path):
    """The WAND read path must push both the bucket (partition column)
    and term predicates into the segment scan."""
    import pyspark.sql.functions as F

    from mee_spark.build import build_full_index
    from mee_spark.config import IndexConfig
    from mee_spark.segments import read_segments

    cfg = IndexConfig(num_doc_partitions=4, num_term_buckets=8,
                      doc_range_size=128, block_size=16)
    docs = em._read(spark, SF_DIR, "documents").select(
        F.format_string("%012d", F.col("doc_id")).alias("url"), "text")
    d = str(tmp_path / "ix")
    build_full_index(spark, docs, cfg, d, gen=1, use_html=False)
    segs = read_segments(spark, d, [1]).filter(
        (F.col("bucket") == 3) & F.col("term").isin(["spark", "query"]))
    plan = plan_of(segs)
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:200]
    assert "PushedFilters" in plan and "term" in plan.split("PushedFilters")[1][:200]


def test_winnow_fingerprints_shuffle_free(spark):
    """Round-7 plan pin: winnowing computes the per-doc sliding-min and
    per-doc dedup in array land — the operator must stay a map-side
    Project+Generate with NO exchange. The n^2 guard is subexpression
    elimination over the twice-referenced hash array (see the
    winnow_fingerprints docstring); this test pins the config it relies
    on alongside the shuffle-free shape."""
    from mee_spark.textops import winnow_fingerprints

    df = winnow_fingerprints(
        em._read(spark, SF_DIR, "documents"), k=8, window=4)
    plan = plan_of(df)
    assert "Exchange" not in plan, "winnow grew a shuffle"
    assert spark.conf.get(
        "spark.sql.subexpressionElimination.enabled", "true") == "true"
