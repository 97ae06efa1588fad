"""Deterministic docID assignment + document stats.

docID contract (FIXTURES.md §4): ``doc_id`` = dense rank of ``url`` in
ascending lexicographic order within the indexed generation — stable,
reproducible, ascending (delta-encoding friendly). ``url`` is the doc
identity anchor, mirroring mee's anchor-field semantics
(`modules/handlers/handlerconfig.py:528-568`: a changed anchor is
delete+reinsert).

URL-ordered docIDs are also the classic document-reordering heuristic
(cf. "Document Reordering for Faster Intersection", VLDB 2019): pages of
the same site sort adjacently, their shared vocabulary clusters, posting
gaps shrink (better varbyte compression) and block-max bounds tighten
(better WAND skipping). We get the reordering win for free from the
identity contract.

Scale note: a naive ``dense_rank`` over a global ``Window.orderBy`` would
collapse to ONE partition — unusable at 10^12 docs. Instead we use the
classic scalable global-ordering pattern: range-repartition by url, sort
within partitions, count rows per partition (a tiny driver-side list, one
int per partition), prefix-sum the counts into per-partition offsets, and
assign ``offset + local_rank``. Every step is fully parallel; the only
driver data is O(num_partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mee_spark.config import IndexConfig
from mee_spark.textprep import extract_text, tokenize_col


def assign_doc_ids(pages: DataFrame, num_partitions: int = 32,
                   start_id: int = 0,
                   materialize_path: str | None = None) -> DataFrame:
    """Return (url, doc_id) with doc_id = start_id + dense rank of url.

    Fully distributed: no global window, no driver materialization beyond
    one count per partition. Exactly ONE shuffle (the range repartition;
    equal urls colocate there and the sorted rank pass dedups them
    adjacent-wise, so no distinct() exchange); the per-partition local
    rank is computed in-place with mapInPandas on the already-range-sorted
    data (a window over the partition id would add another shuffle and
    recompute the chain). The result is cached: it is
    read twice (offset count + downstream join) and at 10^12 docs the
    url→id map must not be recomputed per consumer.
    """
    import numpy as np
    import pandas as pd
    from pyspark import TaskContext

    # NO .distinct() before the range shuffle: range partitioning
    # colocates equal urls and the within-partition sort makes them
    # adjacent, so the rank pass dedups them for free (url != previous).
    # distinct() would cost a SECOND full shuffle of the url set — at
    # 10^12 docs that is the single largest avoidable exchange in the
    # build (and ~1 s of fixed stage time per build at bench scale).
    ranged = (
        pages.select("url")
        .repartitionByRange(num_partitions, "url")
        .sortWithinPartitions("url")
    )

    def attach_local_rank(batches):
        pid = TaskContext.get().partitionId()
        i = 0
        prev = None
        for pdf in batches:
            urls = pdf["url"].to_numpy()
            if len(urls) == 0:
                continue
            # adjacent-dedup: equal urls are contiguous post-sort; the
            # first row of each batch checks against the previous batch's
            # last url (runs can span Arrow batch boundaries)
            keep = np.empty(len(urls), dtype=bool)
            keep[0] = urls[0] != prev
            keep[1:] = urls[1:] != urls[:-1]
            urls = urls[keep]
            prev = pdf["url"].iloc[-1]
            out = pd.DataFrame({
                "url": urls,
                "_pid": pid,
                "_idx": range(i, i + len(urls)),
            })
            i += len(urls)
            yield out

    local = ranged.mapInPandas(attach_local_rank, "url string, _pid int, _idx long").cache()
    counts = {r["_pid"]: r["cnt"] for r in
              local.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, start_id
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = pages.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _offset long"
        )
    )
    out = (
        local.join(off_df, "_pid")
        .select("url", (F.col("_offset") + F.col("_idx")).cast("long").alias("doc_id"))
    )
    if materialize_path is not None:
        # write once, release the in-memory cache, hand back the on-disk
        # map — long-lived builds must not pin executor storage memory
        out.write.mode("overwrite").parquet(materialize_path)
        local.unpersist()
        return spark.read.parquet(materialize_path)
    # expose the cache handle so callers can unpersist once they have
    # materialized downstream (build_full_index releases it after staging)
    out._cached_deps = [local]
    return out


def build_docs(pages: DataFrame, cfg: IndexConfig,
               docmap: DataFrame | None = None,
               use_html: bool = True) -> DataFrame:
    """pages -> (doc_id, url, tokens, dl).

    Extraction is the vectorized Arrow UDF (byte-identical per url);
    tokenization stays JVM-side. When ``use_html`` is False the ``text``
    column is trusted directly (e.g. for corpora without html).
    """
    if cfg.lang_filter:
        pages = pages.filter(F.col("lang") == cfg.lang_filter)
    if docmap is None:
        docmap = assign_doc_ids(pages, cfg.num_doc_partitions)
    text_col = extract_text(F.col("html")) if use_html else F.col("text")
    docs = (
        pages.select("url", text_col.alias("_text"))
        .withColumn("tokens", tokenize_col(F.col("_text")))
        .withColumn("dl", F.size("tokens").cast("long"))
        .drop("_text")
        .join(docmap, "url")
    )
    return docs.select("doc_id", "url", "tokens", "dl")


def corpus_stats(docs: DataFrame) -> dict:
    """(N, avgdl) — computed once per build, broadcast to scorers
    (north star: corpus stats computed once and broadcast)."""
    row = docs.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return {"N": int(row["n"]), "avgdl": float(row["avgdl"] or 0.0)}
