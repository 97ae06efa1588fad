"""Phrase/prefix matching semantics on hand-built corpora.

The oracle parity test proves agreement with DuckDB on the synthetic
corpus; these pin the tricky semantics directly: overlapping
occurrences, duplicate terms inside a phrase, phrase longer than the
doc, and the broadcast shape of the anchor join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mee_spark.phrase import phrase_match, phrase_topk, prefix_match
from mee_spark.postings import build_postings


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t.split()) for i, t in rows],
        "doc_id long, tokens array<string>",
    ).withColumn("dl", F.size("tokens").cast("long"))


def _phrases(spark, rows):
    return spark.createDataFrame(
        [(i, p.split()) for i, p in rows],
        "phrase_id int, terms array<string>")


def test_basic_and_overlapping_occurrences(spark):
    docs = _docs(spark, [
        (1, "a b c a b"),      # "a b" twice
        (2, "b a b a"),        # "a b" once (pos 1)
        (3, "c c c"),          # never
    ])
    out = phrase_match(docs, _phrases(spark, [(0, "a b")]))
    got = {(r.doc_id, r.phrase_tf) for r in out.collect()}
    assert got == {(1, 2), (2, 1)}


def test_duplicate_term_phrase_counts_full_diagonals_only(spark):
    # "b b" in "b b b" overlaps: starts at 0 and 1 -> tf 2; a doc with a
    # single b has no occurrence even though the term matches both slots
    docs = _docs(spark, [(1, "b b b"), (2, "a b a"), (3, "b b")])
    out = phrase_match(docs, _phrases(spark, [(0, "b b")]))
    got = {(r.doc_id, r.phrase_tf) for r in out.collect()}
    assert got == {(1, 2), (3, 1)}


def test_phrase_longer_than_doc_and_oov(spark):
    docs = _docs(spark, [(1, "x y"), (2, "x")])
    out = phrase_match(docs, _phrases(spark, [(0, "x y z"), (1, "q w")]))
    assert out.count() == 0


def test_topk_rank_and_tiebreak(spark):
    docs = _docs(spark, [(1, "a b"), (2, "a b a b"), (3, "a b"), (4, "c")])
    out = phrase_topk(docs, _phrases(spark, [(0, "a b")]), k=2)
    rows = sorted((r.rank, r.doc_id, r.phrase_tf) for r in out.collect())
    # doc 2 wins on tf; docs 1 and 3 tie at tf=1 -> lower doc_id ranks
    assert rows == [(1, 2, 2), (2, 1, 1)]


def test_prefix_match_counts_terms_and_tf(spark):
    docs = _docs(spark, [(1, "win window windows merge"), (2, "window window")])
    pre = spark.createDataFrame(
        [(0, "win"), (1, "zz")], "prefix_id int, prefix string")
    out = prefix_match(build_postings(docs), pre)
    got = {(r.prefix_id, r.doc_id, r.n_terms, r.total_tf)
           for r in out.collect()}
    assert got == {(0, 1, 3, 3), (0, 2, 1, 2)}


def test_anchor_join_broadcasts_phrase_side(spark):
    docs = _docs(spark, [(1, "a b c")])
    df = phrase_match(docs, _phrases(spark, [(0, "a b")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_snippet_window_clamps_at_both_ends(spark):
    from mee_spark.phrase import first_hit_snippets

    docs = _docs(spark, [
        (1, "hit a b c d e f"),     # hit at 0: left edge clamps
        (2, "a b c d e f hit"),     # hit at 6: right edge clamps
        (3, "a b c hit d e f"),     # hit at 3: full +/-3 window
        (4, "no match here"),
    ])
    qt = spark.createDataFrame([(0, "hit")], "query_id int, term string")
    out = {r.doc_id: (r.hit_pos, r.snippet)
           for r in first_hit_snippets(docs, qt, window=3).collect()}
    assert out == {
        1: (0, "hit a b c"),
        2: (6, "d e f hit"),
        3: (3, "a b c hit d e f"),
    }


def test_snippet_uses_earliest_hit_of_any_query_term(spark):
    from mee_spark.phrase import first_hit_snippets

    docs = _docs(spark, [(1, "x x late x early x x late")])
    qt = spark.createDataFrame(
        [(0, "late"), (0, "early")], "query_id int, term string")
    [row] = first_hit_snippets(docs, qt, window=1).collect()
    assert (row.hit_pos, row.snippet) == (2, "x late x")


def test_facets_or_semantics_and_distinct_docs(spark):
    from mee_spark.phrase import facet_counts

    docs = _docs(spark, [
        (1, "a b"), (2, "a a a"), (3, "b"), (4, "c"),
    ])
    meta = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "de"), (4, "en")],
        "doc_id long, lang string")
    qt = spark.createDataFrame(
        [(0, "a"), (0, "b"), (1, "c")], "query_id int, term string")
    out = {(r.query_id, r.lang): r.n_docs
           for r in facet_counts(meta, qt, docs, "lang").collect()}
    # doc 1 matches both terms of query 0 but counts once (OR semantics)
    assert out == {(0, "en"): 2, (0, "de"): 1, (1, "en"): 1}
