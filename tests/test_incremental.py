"""Incremental segment builds ≡ full rebuild (mee sync semantics reframed;
SURVEY.md §5.2 item 5). Compared by URL since docID assignment differs
between an incremental chain and a fresh full build."""

from __future__ import annotations

import pytest

from mee_spark import manifest as mf
from mee_spark.build import build_full_index, build_incremental, live_docmap
from mee_spark.config import IndexConfig
from mee_spark.fixtures import PAGES_SCHEMA, gen_queries, gen_snapshots_pandas
from mee_spark.query_wand import bm25_topk_wand

CFG = IndexConfig(num_doc_partitions=4, num_term_buckets=8,
                  doc_range_size=64, block_size=16)
N_BASE = 200
N_QUERIES = 30


@pytest.fixture(scope="module")
def snaps(spark):
    return {g: spark.createDataFrame(pdf, PAGES_SCHEMA)
            for g, pdf in gen_snapshots_pandas(N_BASE).items()}


def ranked_by_url(spark, index_dir, queries, gens):
    docmap = live_docmap(spark, index_dir, gens)
    id_to_url = {r["doc_id"]: r["url"] for r in docmap.collect()}
    res = bm25_topk_wand(spark, index_dir, queries, CFG, round_digits=6)
    out = {}
    for r in res.collect():
        out.setdefault(r["query_id"], []).append(
            (r["rank"], id_to_url[r["doc_id"]], r["score"]))
    for v in out.values():
        v.sort()
    return out


def test_incremental_equals_full(spark, snaps, tmp_path_factory):
    inc_dir = str(tmp_path_factory.mktemp("inc_index"))
    full_dir = str(tmp_path_factory.mktemp("full_index"))
    queries = gen_queries(spark, N_QUERIES)

    m1 = build_full_index(spark, snaps[1], CFG, inc_dir, gen=1)
    m2 = build_incremental(spark, snaps[2], CFG, inc_dir, gen=2)
    m3 = build_incremental(spark, snaps[3], CFG, inc_dir, gen=3)
    assert mf.current_gen(inc_dir) == 3
    assert m2["metrics"]["docs_added"] > 0 and m2["metrics"]["docs_changed"] > 0
    assert m3["metrics"]["docs_deleted"] > 0

    mf_full = build_full_index(spark, snaps[3], CFG, full_dir, gen=1)

    # live corpus stats agree exactly
    assert m3["n_docs_live"] == mf_full["n_docs_live"]
    assert m3["sum_dl_live"] == mf_full["sum_dl_live"]

    inc = ranked_by_url(spark, inc_dir, queries, [1, 2, 3])
    full = ranked_by_url(spark, full_dir, queries, [1])
    assert set(inc) == set(full)
    for qid in full:
        inc_l, full_l = inc[qid], full[qid]
        # scores must match rank-for-rank; urls must match except within
        # exact-score tie groups (docID order differs between chains)
        assert [s for _, _, s in inc_l] == [s for _, _, s in full_l], f"q{qid} scores"
        by_score_inc: dict[float, set] = {}
        by_score_full: dict[float, set] = {}
        for (_, u, s) in inc_l:
            by_score_inc.setdefault(s, set()).add(u)
        for (_, u, s) in full_l:
            by_score_full.setdefault(s, set()).add(u)
        for s in by_score_full:
            if len(by_score_full[s]) == len(by_score_inc.get(s, set())):
                assert by_score_full[s] == by_score_inc[s], f"q{qid} tie group {s}"


def test_layout_mismatch_rejected(spark, snaps, tmp_path_factory):
    """ADVICE r2 (query_wand.py:220): doc_range_size buckets the tombstone
    mask; a query/compaction/delta-build using a different value than build
    time would silently resurrect deleted docs. The layout is persisted in
    the manifest and every reuse path must refuse a mismatched cfg."""
    import dataclasses

    from mee_spark.merge import compact

    d = str(tmp_path_factory.mktemp("layout"))
    build_full_index(spark, snaps[1], CFG, d, gen=1)
    assert mf.read_manifest(d, 1)["config"] == {
        "doc_range_size": CFG.doc_range_size,
        "num_term_buckets": CFG.num_term_buckets,
    }
    bad_range = dataclasses.replace(CFG, doc_range_size=CFG.doc_range_size * 2)
    bad_buckets = dataclasses.replace(CFG, num_term_buckets=CFG.num_term_buckets * 2)
    queries = gen_queries(spark, 3)
    with pytest.raises(ValueError, match="doc_range_size"):
        bm25_topk_wand(spark, d, queries, bad_range)
    with pytest.raises(ValueError, match="num_term_buckets"):
        bm25_topk_wand(spark, d, queries, bad_buckets)
    with pytest.raises(ValueError, match="doc_range_size"):
        build_incremental(spark, snaps[2], bad_range, d, gen=2)
    with pytest.raises(ValueError, match="doc_range_size"):
        compact(spark, d, bad_range, new_gen=9)
    # the recorded layout still works, and the delta gen records it too
    build_incremental(spark, snaps[2], CFG, d, gen=2)
    assert mf.read_manifest(d, 2)["config"]["doc_range_size"] == CFG.doc_range_size
    assert bm25_topk_wand(spark, d, queries, CFG).count() >= 0


def test_incremental_unchanged_docs_not_reindexed(spark, snaps, tmp_path_factory):
    """Dependency pruning (mee J6 `handlerconfig.py:303-347`): only
    added/changed docs produce postings in the delta generation."""
    d = str(tmp_path_factory.mktemp("inc2"))
    build_full_index(spark, snaps[1], CFG, d, gen=1)
    m2 = build_incremental(spark, snaps[2], CFG, d, gen=2)
    n_delta = m2["metrics"]["docs_added"] + m2["metrics"]["docs_changed"]
    # the delta docmap holds exactly the touched docs
    n_rows = spark.read.parquet(f"{d}/gen=2/docmap.parquet").count()
    assert n_rows == n_delta
    assert n_delta < N_BASE // 2  # vastly fewer than a rebuild


def test_deleted_docs_disappear_from_results(spark, snaps, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("inc3"))
    build_full_index(spark, snaps[2], CFG, d, gen=1)
    build_incremental(spark, snaps[3], CFG, d, gen=2)
    live = {r["url"] for r in live_docmap(spark, d, [1, 2]).collect()}
    gone = set(snaps[2].select("url").toPandas()["url"]) - set(
        snaps[3].select("url").toPandas()["url"])
    assert gone and not (gone & live)
    queries = gen_queries(spark, N_QUERIES)
    res = bm25_topk_wand(spark, d, queries, CFG)
    docmap = live_docmap(spark, d, [1, 2])
    id_to_url = {r["doc_id"]: r["url"] for r in docmap.collect()}
    for r in res.collect():
        assert id_to_url[r["doc_id"]] not in gone


def test_docid_watermark_from_manifest(spark, snaps, tmp_path_factory):
    """The manifest chain carries next_doc_id (the fresh-ID watermark) so
    build_incremental appends without a max(doc_id) scan of the live
    docmap; IDs are monotone across the chain and never collide, and a
    pre-watermark manifest (field absent) falls back to the scan."""
    import json

    d = str(tmp_path_factory.mktemp("wmark"))
    m1 = build_full_index(spark, snaps[1], CFG, d, gen=1)
    # full build: watermark = number of assigned docs (ids are 0..n-1)
    n1 = spark.read.parquet(f"{d}/gen=1/docmap.parquet").count()
    assert m1["next_doc_id"] == n1

    m2 = build_incremental(spark, snaps[2], CFG, d, gen=2)
    added2 = m2["metrics"]["docs_added"]
    assert m2["next_doc_id"] == n1 + added2
    # every freshly assigned id in gen 2 sits at/above gen 1's watermark
    dm2 = spark.read.parquet(f"{d}/gen=2/docmap.parquet")
    fresh2 = dm2.filter(f"doc_id >= {n1}").count()
    assert fresh2 == added2
    assert dm2.agg({"doc_id": "max"}).collect()[0][0] == m2["next_doc_id"] - 1

    # fallback: strip the field from the newest manifest -> the scan path
    # must produce the same watermark-respecting assignment
    mp = mf.manifest_path(d, 2)
    rec = json.load(open(mp))
    del rec["next_doc_id"]
    json.dump(rec, open(mp, "w"))
    m3 = build_incremental(spark, snaps[3], CFG, d, gen=3)
    dm3_max = spark.read.parquet(f"{d}/gen=3/docmap.parquet").agg(
        {"doc_id": "max"}).collect()[0][0]
    assert m3["next_doc_id"] >= m2["next_doc_id"] - 1
    if m3["metrics"]["docs_added"]:
        assert dm3_max == m3["next_doc_id"] - 1
    # no duplicate ids anywhere in the chain's union of fresh assignments
    ids1 = {r[0] for r in spark.read.parquet(f"{d}/gen=1/docmap.parquet")
            .select("doc_id").collect()}
    fresh_ids2 = {r[0] for r in dm2.filter(f"doc_id >= {n1}")
                  .select("doc_id").collect()}
    assert not (ids1 & fresh_ids2)


def test_vocab_in_plan_with_tombstones(spark, snaps, tmp_path_factory):
    """Plan-mode vocabulary transport must agree with the dict path on a
    chain that exercises the live-df decode (tombstones present)."""
    d = str(tmp_path_factory.mktemp("vplan"))
    build_full_index(spark, snaps[2], CFG, d, gen=1)
    build_incremental(spark, snaps[3], CFG, d, gen=2)
    queries = gen_queries(spark, N_QUERIES)
    a = bm25_topk_wand(spark, d, queries, CFG, vocab_in_plan=False).collect()
    b = bm25_topk_wand(spark, d, queries, CFG, vocab_in_plan=True).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted([tuple(r) for r in a], key=lambda t: (t[0], t[1])) == \
           sorted([tuple(r) for r in b], key=lambda t: (t[0], t[1]))
