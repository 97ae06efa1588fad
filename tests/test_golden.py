"""Committed golden artifacts (FIXTURES.md §3): regenerating the corpus,
extraction, tokenizer, and oracle BM25 must reproduce the committed
values bit-for-bit. Guards against accidental generator/tokenizer/scoring
drift between rounds — no Spark involved."""

from __future__ import annotations

import hashlib
import json
import os

import pytest

from mee_spark.fixtures import gen_pages_pandas, gen_queries_pandas
from mee_spark.oracle import OracleIndex
from mee_spark.textprep import extract_text_bytes

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_v1.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def rebuilt(golden):
    pages = gen_pages_pandas(golden["n_docs"])
    urls = sorted(pages["url"])
    url_to_id = {u: i for i, u in enumerate(urls)}
    oracle = OracleIndex.build(
        [(url_to_id[r.url], extract_text_bytes(bytes(r.html))) for r in pages.itertuples()])
    return pages, url_to_id, oracle


def test_text_hashes_byte_identical(golden, rebuilt):
    pages, url_to_id, _ = rebuilt
    for r in pages.itertuples():
        if r.url in golden["text_sha256"]:
            h = hashlib.sha256(extract_text_bytes(bytes(r.html)).encode()).hexdigest()
            assert h == golden["text_sha256"][r.url], r.url


def test_corpus_stats_stable(golden, rebuilt):
    _, _, oracle = rebuilt
    assert oracle.n_docs == golden["corpus"]["N"]
    assert oracle.avgdl == pytest.approx(golden["corpus"]["avgdl"], abs=1e-12)


def test_topk_stable(golden, rebuilt):
    _, _, oracle = rebuilt
    queries = gen_queries_pandas(10)
    for q in queries.itertuples():
        want = golden["topk"][str(q.query_id)]
        got = oracle.topk(q.query_text, q.k)
        assert [d for d, _ in got] == [d for d, _ in want], f"q{q.query_id}"
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9)


def test_postings_sample_stable(golden, rebuilt):
    _, _, oracle = rebuilt
    for term, plist in golden["postings_sample"].items():
        assert sorted(oracle.postings[term].items()) == [tuple(p) for p in plist]
