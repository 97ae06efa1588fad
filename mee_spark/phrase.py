"""Phrase and prefix queries over the tokenized corpus.

The reference ships documents to Elasticsearch and lets Lucene answer
``match_phrase`` / ``prefix`` queries against its positional index
(`modules/handlers/v1/commonhandler.py:68-83` — the indexing call; the
query side lives in ES itself). Here both are declarative Catalyst plans
over the same (doc_id, tokens) relation the BM25 path uses.

Phrase matching uses an ANCHOR JOIN rather than materialized positional
posting lists: explode the corpus once to (doc_id, position, term), inner
join against the broadcast exploded phrase terms (phrase_id, term_idx,
term), and let ``anchor = position - term_idx``. A document contains the
phrase at start position ``a`` iff the group (phrase_id, doc_id, a)
collects every term_idx of the phrase — a diagonal in (position,
term_idx) space. This is equivalent to intersecting shifted positional
postings, but needs no per-term position arrays and exactly one shuffle.

100-TB shape:
* The broadcast join FILTERS the exploded token stream to phrase terms
  on the map side — only occurrences of query terms ever shuffle, so
  cost is proportional to the matched postings, not the corpus.
* The shuffle key (phrase_id, doc_id, anchor) carries doc_id, so a
  stop-word inside a phrase ("the"-class, >30% of docs) spreads across
  reducers instead of funneling one key.
* Duplicate terms inside a phrase ("batch batch batch") are handled by
  counting DISTINCT term_idx per anchor: each occurrence votes for
  every index it could fill, and only a complete diagonal matches.

Prefix matching scans the postings relation with a broadcast
``startswith`` predicate — at segment scale the sorted term dictionary
makes this a bucket range scan (terms are range-bucketed by
``segments.py``; a prefix maps to a contiguous bucket interval), so the
nested-loop form below is the semantics, not the physical plan you'd
run against the persisted index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def phrase_match(docs: DataFrame, phrases: DataFrame) -> DataFrame:
    """(doc_id, tokens) × (phrase_id, terms) → (phrase_id, doc_id, phrase_tf).

    ``phrase_tf`` counts the DISTINCT start positions where the full
    phrase occurs (overlapping occurrences each count: "b b b" contains
    "b b" twice). Docs with no occurrence produce no row.
    """
    pt = phrases.select(
        "phrase_id", F.posexplode("terms").alias("idx", "term"))
    plen = phrases.select(
        "phrase_id", F.size("terms").alias("n_terms"))
    tok = docs.select("doc_id", F.posexplode("tokens").alias("p", "term"))
    anchors = (
        tok.join(F.broadcast(pt), "term")
        # a phrase starting at anchor a needs term_idx i at position a+i;
        # p < idx can never complete — prune before the shuffle
        .where(F.col("p") >= F.col("idx"))
        .select("phrase_id", "doc_id",
                (F.col("p") - F.col("idx")).alias("anchor"), "idx")
        .groupBy("phrase_id", "doc_id", "anchor")
        .agg(F.countDistinct("idx").alias("hits"))
    )
    return (
        anchors.join(F.broadcast(plen), "phrase_id")
        .where(F.col("hits") == F.col("n_terms"))
        .groupBy("phrase_id", "doc_id")
        .agg(F.count("*").cast("long").alias("phrase_tf"))
    )


def phrase_topk(docs: DataFrame, phrases: DataFrame, k: int = 10) -> DataFrame:
    """Top-k docs per phrase by occurrence count (ties → lower doc_id).

    The ES analogue is ``match_phrase`` under a ``size`` limit; scoring
    by raw phrase frequency keeps the oracle exact (BM25 weighting of
    phrase hits would just rescale a deterministic quantity).
    """
    from pyspark.sql import Window

    m = phrase_match(docs, phrases)
    w = Window.partitionBy("phrase_id").orderBy(
        F.desc("phrase_tf"), F.asc("doc_id"))
    return (
        m.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("phrase_id", "doc_id", "phrase_tf",
                F.col("rank").cast("long").alias("rank"))
    )


def prefix_match(postings: DataFrame, prefixes: DataFrame) -> DataFrame:
    """(term, doc_id, tf) × (prefix_id, prefix) → per-doc prefix stats.

    Returns (prefix_id, doc_id, n_terms, total_tf): how many distinct
    index terms in the doc start with the prefix and their summed term
    frequency — the expansion ES's ``prefix`` query does against the
    term dictionary before scoring.
    """
    joined = postings.join(
        F.broadcast(prefixes),
        F.col("term").startswith(F.col("prefix")))
    return (
        joined.groupBy("prefix_id", "doc_id")
        .agg(F.countDistinct("term").cast("long").alias("n_terms"),
             F.sum("tf").cast("long").alias("total_tf"))
    )


def first_hit_snippets(docs: DataFrame, qterms: DataFrame,
                       window: int = 3) -> DataFrame:
    """Token-window snippets around the first query-term hit per doc.

    (doc_id, tokens) × (query_id, term) → (query_id, doc_id, hit_pos,
    snippet): ``hit_pos`` is the earliest position of ANY of the query's
    terms in the doc (docs with no hit produce no row), ``snippet`` the
    ``window`` tokens either side of it — the deterministic core of ES's
    highlighter (fragment selection around the first match).

    Scale: the exploded token stream is filtered map-side by the
    broadcast term set; the min-position groupBy shuffles matched
    occurrences only. Compose AFTER top-k retrieval at 100 TB (see
    ``q_fulltext_topk_snippets``) so snippets are built for k docs per
    query, not every match.
    """
    tok = docs.select("doc_id", F.posexplode("tokens").alias("p", "term"))
    hits = (tok.join(F.broadcast(qterms), "term")
            .groupBy("query_id", "doc_id")
            .agg(F.min("p").alias("hit_pos")))
    return (
        hits.join(docs.select("doc_id", "tokens"), "doc_id")
        .select(
            "query_id", "doc_id",
            F.col("hit_pos").cast("long").alias("hit_pos"),
            F.array_join(
                # slice() is 1-based; clamp the left edge at the doc start
                F.slice(
                    "tokens",
                    F.greatest(F.col("hit_pos") - window + 1, F.lit(1)),
                    # left-clamped windows still end at hit_pos + window
                    F.col("hit_pos") + window + 1
                    - F.greatest(F.col("hit_pos") - window, F.lit(0)),
                ),
                " ",
            ).alias("snippet"),
        )
    )


def facet_counts(docs_meta: DataFrame, qterms: DataFrame,
                 docs: DataFrame, facet_col: str) -> DataFrame:
    """Terms-aggregation under a query (ES ``aggs`` on a filtered set):
    per query, how many matching docs fall in each ``facet_col`` bucket.

    ``docs_meta`` carries (doc_id, <facet_col>); a doc matches a query
    if it contains ANY of its terms (OR semantics, like ES ``match``).
    Returns (query_id, <facet_col>, n_docs).

    Scale: matched (query_id, doc_id) pairs come from one broadcast
    join over the exploded tokens; the facet join is a broadcast-able
    dimension lookup only when docs_meta is small — here it rides the
    same corpus relation, so Catalyst plans a shuffled join on doc_id,
    which is the right shape (both sides corpus-sized, co-partitioned).
    """
    tok = docs.select("doc_id", F.explode("tokens").alias("term"))
    matched = (tok.join(F.broadcast(qterms), "term")
               .select("query_id", "doc_id").distinct())
    return (
        matched.join(docs_meta.select("doc_id", facet_col), "doc_id")
        .groupBy("query_id", facet_col)
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
