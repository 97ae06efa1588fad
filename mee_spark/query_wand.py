"""Segment-backed BM25 top-k query engine with block-max WAND pruning.

The read path mee never had (reads were Elasticsearch's job; mee only
wrote, `modules/handlers/v1/commonhandler.py:68-83`). Execution shape,
designed for 10^12 docs / 1000 executors:

1. **Partition pruning** — the query-term set (tiny) is hashed to its
   term buckets with the same ``xxhash64`` Spark expression used at
   write time; the segment scan filters ``bucket IN (...)`` (directory
   pruning via the partition column) AND ``term IN (...)`` (Parquet
   row-group pruning — rows are term-sorted within files). Only the
   postings of the queried terms are ever read.
2. **Corpus stats broadcast** — N/avgdl come from the manifest chain
   (computed once per build); per-term global df is a tiny aggregate
   over the matched rows only, broadcast into the scorers.
3. **Distributed scoring** — matched segment rows join the broadcast
   query set, then ``groupBy(query_id, range_id).applyInPandas``: each
   task runs block-max WAND over ONE docID range of one query. A head
   term's 10^12-posting list is never gathered anywhere — each range
   holds ≤ doc_range_size of it, scored independently with a local
   top-k heap.
4. **Global top-k** — union of per-range top-k candidates (≤ k·ranges
   rows, tiny) through a window rank. Ties break (score desc, doc_id
   asc) for determinism.

Generations: rows from every gen in the manifest chain are unioned;
tombstones (docs deleted/re-indexed in later gens) are broadcast and
masked out at decode time — last-writer-wins, mee's incremental-sync
semantics (`services/syncservice.py:64-93`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mee_spark import manifest as mf
from mee_spark.bm25 import idf_np
from mee_spark.build import read_tombstones
from mee_spark.codec import decode_postings
from mee_spark.config import IndexConfig
from mee_spark.query import explode_query_terms
from mee_spark.segments import read_segments
from mee_spark.wand import TermCursor, exhaustive_topk_vec, wand_topk

_LOCAL_SCHEMA = "query_id int, k int, doc_id long, score double"


def _term_buckets(spark: SparkSession, terms: list[str], num_buckets: int) -> list[int]:
    """Bucket ids for the query terms — same expression as the writer."""
    if not terms:
        return []
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    rows = tdf.select(
        F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("long").alias("b")
    ).distinct().collect()
    return sorted(r["b"] for r in rows)


def _tombstone_masks(spark: SparkSession, index_dir: str, gens: list[int]):
    """{gen: sorted int64 array of doc_ids tombstoned AT that gen}."""
    tdf = read_tombstones(spark, index_dir, gens)
    if tdf is None:
        return {}
    out: dict[int, np.ndarray] = {}
    for r in tdf.groupBy("tomb_gen").agg(F.collect_list("doc_id").alias("ids")).collect():
        out[int(r["tomb_gen"])] = np.sort(np.array(r["ids"], dtype=np.int64))
    return out


def _make_scorer(df_map: dict, n_docs: int, avgdl: float, tombs: dict,
                 k1: float, b: float, use_block_max: bool,
                 wand_min_postings: int = 1 << 16):
    """Scorer for one docID range, ALL queries at once.

    Grouping by range (not (query, range)) turns q·ranges tiny Arrow
    groups into `ranges` medium ones — far less per-group overhead — and
    lets each (term, gen) posting row be DECODED ONCE and shared by every
    query containing the term (head terms appear in many queries).
    TermCursor traversal state is per-query, so cursors are rebuilt
    cheaply from the shared decoded arrays."""

    def score_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        decoded: dict[tuple, tuple | None] = {}
        for row in pdf.drop_duplicates(subset=["term", "gen"]).itertuples():
            docs, tfs, dls = decode_postings(row)
            gen = int(row.gen)
            dead = [ids for g, ids in tombs.items() if g > gen]
            if dead:
                keep = ~np.isin(docs, np.concatenate(dead))
                if not keep.all():
                    docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
            if len(docs) == 0:
                decoded[(row.term, gen)] = None
                continue
            idf = idf_np(float(df_map[row.term]), n_docs)
            decoded[(row.term, gen)] = (
                docs, tfs, dls, idf,
                np.asarray(row.block_last_doc), np.asarray(row.block_max_tf),
                np.asarray(row.block_min_dl),
            )
        out = []
        qmeta = pdf[["query_id", "k", "term", "gen"]]
        for qid, sub in qmeta.groupby("query_id", sort=True):
            k = int(sub["k"].iloc[0])
            cursors = []
            for term, gen in zip(sub["term"], sub["gen"]):
                payload = decoded[(term, int(gen))]
                if payload is None:
                    continue
                docs, tfs, dls, idf, bl, btf, bdl = payload
                # term key embeds the gen: a changed doc's postings live in
                # exactly one (term, gen) cursor; lexicographic sort keeps
                # the scoring order deterministic
                cursors.append(TermCursor(f"{term}\x00{gen}", docs, tfs, dls,
                                          idf, avgdl, bl, btf, bdl, k1, b))
            # hybrid: vectorized exhaustive for range-bounded small lists,
            # block-max WAND where skipping wins (identical results; see
            # wand.exhaustive_topk_vec docstring)
            if sum(c.n for c in cursors) < wand_min_postings:
                top = exhaustive_topk_vec(cursors, k)
            else:
                top = wand_topk(cursors, k, use_block_max=use_block_max)
            if top:
                out.append(pd.DataFrame(
                    {"query_id": int(qid), "k": k,
                     "doc_id": [d for d, _ in top], "score": [s for _, s in top]}))
        if not out:
            return pd.DataFrame({"query_id": pd.Series(dtype="int32"),
                                 "k": pd.Series(dtype="int32"),
                                 "doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        return pd.concat(out, ignore_index=True)

    return score_group


def bm25_topk_wand(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    cfg: IndexConfig,
    gen: int | None = None,
    round_digits: int | None = 6,
    use_block_max: bool = True,
) -> DataFrame:
    """-> (query_id, rank, doc_id, score): per-query top-k over the
    published index (or ``gen``'s chain). ``queries`` needs
    (query_id, query_text, k)."""
    chain = mf.manifest_chain(index_dir, gen)
    if not chain:
        raise ValueError(f"no published index at {index_dir}")
    gens = [m["generation"] for m in chain]
    n_docs = chain[-1]["n_docs_live"]
    avgdl = chain[-1]["avgdl"]

    qterms = explode_query_terms(queries)  # (query_id, k, term)
    terms = [r["term"] for r in qterms.select("term").distinct().collect()]
    if not terms:
        return spark.createDataFrame([], "query_id int, rank long, doc_id long, score double")
    buckets = _term_buckets(spark, terms, cfg.num_term_buckets)

    # cached: the pruned scan (query terms only — tiny next to the index)
    # feeds both the df aggregation and the scoring join
    segs = (
        read_segments(spark, index_dir, gens)
        .filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
        .cache()
    )
    tombs = _tombstone_masks(spark, index_dir, gens)

    if tombs:
        # exact live df needs decode (old gens still hold dead postings)
        tomb_b = spark.sparkContext.broadcast(tombs)

        def live_counts(batches):
            for pdf in batches:
                counts = []
                for row in pdf.itertuples():
                    docs, _, _ = decode_postings(row)
                    dead = [ids for g, ids in tomb_b.value.items() if g > int(row.gen)]
                    n = len(docs) if not dead else int(
                        (~np.isin(docs, np.concatenate(dead))).sum())
                    counts.append((row.term, n))
                yield pd.DataFrame(counts, columns=["term", "live"])

        df_rows = (
            segs.mapInPandas(live_counts, "term string, live long")
            .groupBy("term").agg(F.sum("live").alias("df")).collect()
        )
    else:
        df_rows = segs.groupBy("term").agg(F.sum("df_local").alias("df")).collect()
    df_map = {r["term"]: int(r["df"]) for r in df_rows}

    # parallelism = ranges x query-shards: sharding the query batch keeps
    # big batches parallel even over few ranges, while queries within a
    # shard still share each (term, gen) decode
    n_qshards = max(1, min(8, queries.count()))
    joined = (
        segs.join(F.broadcast(qterms), "term")
        .withColumn("_qshard", F.pmod(F.col("query_id"), F.lit(n_qshards)))
    )
    scorer = _make_scorer(df_map, n_docs, avgdl, tombs, cfg.k1, cfg.b,
                          use_block_max, cfg.wand_min_postings)
    local = joined.groupBy("range_id", "_qshard").applyInPandas(scorer, _LOCAL_SCHEMA)

    score_key = (
        F.round(F.col("score"), round_digits) if round_digits is not None else F.col("score")
    )
    w = Window.partitionBy("query_id").orderBy(score_key.desc(), F.col("doc_id").asc())
    out_score = score_key.alias("score") if round_digits is not None else F.col("score")
    return (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= F.col("k"))
        .select(F.col("query_id").cast("int").alias("query_id"), "rank",
                F.col("doc_id").cast("long").alias("doc_id"), out_score)
    )
