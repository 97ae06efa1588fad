"""Segment index end-to-end: build → WAND query ≡ oracle ≡ exhaustive;
resume-from-checkpoint; incremental ≡ full (SURVEY.md §5.2 items 3-6)."""

from __future__ import annotations

import os

import pytest

from mee_spark import manifest as mf
from mee_spark.build import build_full_index, build_incremental, live_docmap
from mee_spark.config import IndexConfig
from mee_spark.docmap import corpus_stats
from mee_spark.fixtures import (
    PAGES_SCHEMA,
    gen_pages,
    gen_queries,
    gen_queries_pandas,
    gen_snapshots_pandas,
)
from mee_spark.oracle import OracleIndex
from mee_spark.query import bm25_topk_exhaustive
from mee_spark.query_wand import bm25_topk_wand
from mee_spark.textprep import extract_text_bytes

N_DOCS = 250
N_QUERIES = 40
CFG = IndexConfig(num_doc_partitions=4, num_term_buckets=8,
                  doc_range_size=64, block_size=16)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("index"))
    pages = gen_pages(spark, N_DOCS, num_partitions=4)
    manifest = build_full_index(spark, pages, CFG, index_dir, gen=1)
    queries = gen_queries(spark, N_QUERIES)
    return dict(index_dir=index_dir, manifest=manifest, queries=queries, pages=pages)


def collect_ranked(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for v in out.values():
        v.sort()
    return out


def test_manifest_published(built):
    assert mf.current_gen(built["index_dir"]) == 1
    m = built["manifest"]
    assert m["n_docs_live"] == N_DOCS
    assert m["metrics"]["docs_per_sec"] > 0
    assert len(m["metrics"]["partitions"]) > 0
    # segment files + checkpoints exist 1:1
    done = mf.completed_checkpoints(built["index_dir"], 1)
    assert len(done) == len(m["metrics"]["partitions"])


def test_wand_matches_oracle(built, spark):
    """Rank identity (docIDs AND scores) vs the pure-Python oracle."""
    pages_rows = built["pages"].select("url", "html").collect()
    docmap = live_docmap(spark, built["index_dir"], [1])
    url_to_id = {r["url"]: r["doc_id"] for r in docmap.collect()}
    oracle = OracleIndex.build(
        [(url_to_id[r["url"]], extract_text_bytes(bytes(r["html"]))) for r in pages_rows]
    )
    res = collect_ranked(
        bm25_topk_wand(spark, built["index_dir"], built["queries"], CFG, round_digits=None)
    )
    for q in gen_queries_pandas(N_QUERIES).itertuples():
        want = oracle.topk(q.query_text, k=q.k)
        have = res.get(q.query_id, [])
        assert [d for _, d, _ in have] == [d for d, _ in want], f"q{q.query_id}"
        for (_, _, s_have), (_, s_want) in zip(have, want):
            assert s_have == pytest.approx(s_want, abs=1e-9)


def test_wand_equals_exhaustive_spark(built, spark):
    """Block-max pruning is loss-free vs the declarative DataFrame path."""
    from mee_spark.docmap import build_docs
    from mee_spark.postings import build_postings

    docs = build_docs(built["pages"], CFG)
    stats = corpus_stats(docs)
    postings = build_postings(docs)
    exh = collect_ranked(bm25_topk_exhaustive(
        postings, built["queries"], stats["N"], stats["avgdl"], k=None, round_digits=6))
    wnd = collect_ranked(bm25_topk_wand(
        spark, built["index_dir"], built["queries"], CFG, round_digits=6))
    assert exh == wnd
    # force the pure block-max WAND path (no vectorized fast path): identical
    import dataclasses

    cfg_wand = dataclasses.replace(CFG, wand_min_postings=0)
    wnd2 = collect_ranked(bm25_topk_wand(
        spark, built["index_dir"], built["queries"], cfg_wand, round_digits=6))
    assert exh == wnd2


def test_resume_from_checkpoint(built, spark, tmp_path):
    """Kill-after-checkpoint simulation (SURVEY §5.2 item 6): deleting one
    segment file + its checkpoint and rebuilding reproduces the identical
    index; completed partitions are skipped (their files untouched)."""
    import glob

    index_dir = built["index_dir"]
    seg_files = sorted(glob.glob(os.path.join(mf.segments_dir(index_dir, 1), "*", "*.parquet")))
    victim = seg_files[0]
    bucket = int(victim.split("bucket=")[1].split("/")[0])
    range_id = int(os.path.basename(victim).split("_")[1].split(".")[0])
    os.remove(victim)
    os.remove(os.path.join(mf.checkpoints_dir(index_dir, 1),
                           mf.checkpoint_name(bucket, range_id)))
    survivors = [f for f in seg_files if f != victim]
    mtimes_before = {f: os.path.getmtime(f) for f in survivors}

    build_full_index(spark, built["pages"], CFG, index_dir, gen=1, resume=True)
    # victim restored, survivors not rewritten
    assert os.path.exists(victim)
    assert {f: os.path.getmtime(f) for f in survivors} == mtimes_before
    res = bm25_topk_wand(spark, index_dir, built["queries"], CFG)
    assert collect_ranked(res)  # non-empty and consistent


def test_vocab_in_plan_matches_dict_path(built, spark):
    """Large-batch mode (df + per-query term counts as plan columns, term
    pruning by broadcast semi-join, bucket list as the only driver
    collect) must be result-identical to the small-batch dict path, in
    both disjunctive and conjunctive modes."""
    for conj in (False, True):
        dict_res = collect_ranked(bm25_topk_wand(
            spark, built["index_dir"], built["queries"], CFG,
            conjunctive=conj, vocab_in_plan=False))
        plan_res = collect_ranked(bm25_topk_wand(
            spark, built["index_dir"], built["queries"], CFG,
            conjunctive=conj, vocab_in_plan=True))
        assert dict_res == plan_res, f"conjunctive={conj}"


def test_vocab_in_plan_auto_dispatch(built, spark, monkeypatch):
    """The auto probe (bounded LIMIT count) flips to plan mode past the
    threshold; results stay identical either way."""
    import mee_spark.query_wand as qw

    baseline = collect_ranked(bm25_topk_wand(
        spark, built["index_dir"], built["queries"], CFG, vocab_in_plan=False))
    monkeypatch.setattr(qw, "VOCAB_IN_PLAN_THRESHOLD", 5)
    auto = collect_ranked(bm25_topk_wand(
        spark, built["index_dir"], built["queries"], CFG))
    assert auto == baseline
