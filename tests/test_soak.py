"""Medium-scale soak: 1500 docs / 60 queries over many docID ranges, term
buckets and TWO generations — rank identity vs the oracle end-to-end, and
snapshot isolation (readers of the published gen are unaffected by an
in-flight unpublished build)."""

from __future__ import annotations

import pytest

from mee_spark import manifest as mf
from mee_spark.build import build_full_index, build_incremental, live_docmap
from mee_spark.config import IndexConfig
from mee_spark.fixtures import PAGES_SCHEMA, gen_pages, gen_queries, gen_queries_pandas
from mee_spark.oracle import OracleIndex
from mee_spark.query_wand import bm25_topk_wand
from mee_spark.textprep import extract_text_bytes

N_DOCS = 1500
N_QUERIES = 60
CFG = IndexConfig(num_doc_partitions=8, num_term_buckets=16,
                  doc_range_size=128, block_size=32)  # ~12 ranges x 16 buckets


@pytest.fixture(scope="module")
def soak(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("soak_ix"))
    pages = gen_pages(spark, N_DOCS, num_partitions=8).cache()
    half = pages.filter(f"warc_ts < timestamp'2026-01-01 00:{N_DOCS//2//60:02d}:{N_DOCS//2%60:02d}'")
    build_full_index(spark, half, CFG, d, gen=1)
    build_incremental(spark, pages, CFG, d, gen=2)  # second half arrives as delta
    return dict(dir=d, pages=pages)


def test_soak_rank_identity(spark, soak):
    rows = soak["pages"].select("url", "html").collect()
    docmap = live_docmap(spark, soak["dir"], [1, 2])
    url_to_id = {r["url"]: r["doc_id"] for r in docmap.collect()}
    assert len(url_to_id) == N_DOCS
    oracle = OracleIndex.build(
        [(url_to_id[r["url"]], extract_text_bytes(bytes(r["html"]))) for r in rows])
    queries = gen_queries(spark, N_QUERIES)
    res = {}
    for r in bm25_topk_wand(spark, soak["dir"], queries, CFG, round_digits=None).collect():
        res.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for v in res.values():
        v.sort()
    for q in gen_queries_pandas(N_QUERIES).itertuples():
        want = oracle.topk(q.query_text, k=q.k)
        have = res.get(q.query_id, [])
        assert [d for _, d, _ in have] == [d for d, _ in want], f"q{q.query_id}"
        for (_, _, sh), (_, sw) in zip(have, want):
            assert sh == pytest.approx(sw, abs=1e-9)


def test_snapshot_isolation_during_inflight_build(spark, soak):
    """mee T3: readers never see a partial index. An unpublished gen 3
    (even fully written) must not change query results until publish."""
    d = soak["dir"]
    queries = gen_queries(spark, 10)
    before = bm25_topk_wand(spark, d, queries, CFG).collect()
    # in-flight build with 200 NEW docs, fully written but NOT published —
    # if it leaked into reads, scores/df/N would all shift
    bigger = gen_pages(spark, N_DOCS + 200, num_partitions=8)
    build_incremental(spark, bigger, CFG, d, gen=3, publish=False)
    assert mf.current_gen(d) == 2  # still the old generation
    after = bm25_topk_wand(spark, d, queries, CFG).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
    mf.reset_incomplete(d, 3)  # abandon the in-flight build (mee `reset`)
