"""Segment compaction: collapse a generation chain into one generation.

mee's incremental path grows state forever (ES absorbs it); our LSM-style
chain accumulates delta generations + tombstones, and compaction is the
counterpart of ES's own segment merging: decode every LIVE posting across
the chain, rewrite a single fresh generation, drop tombstones. Queries
before/after compaction are identical (tested).

Scale shape: segment rows are bounded ((term, docID-range) runs), so the
decode fan-out is a mapInPandas over bounded rows — no driver data, no
unbounded group. The re-encode reuses build_segments (same skew caps).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from mee_spark import manifest as mf
from mee_spark.build import _docmap_path, live_docmap
from mee_spark.codec import decode_postings
from mee_spark.config import IndexConfig
from mee_spark.segments import build_segments, read_segments


def decoded_postings(spark: SparkSession, index_dir: str, gens: list[int],
                     range_size: int):
    """Explode all LIVE postings of the chain back to (term, doc_id, tf, dl).

    Tombstone masks (docs superseded/deleted at a later gen) are applied
    during decode, identical to the query path: tombstones stay a
    DataFrame, joined per docID range — never collected to the driver
    (a high-churn chain's tombstone set outgrows driver memory long
    before compaction becomes urgent)."""
    from mee_spark.query_wand import _dead_ids, tombstones_per_range

    segs = read_segments(spark, index_dir, gens)
    tombs = tombstones_per_range(spark, index_dir, gens, range_size)
    if tombs is not None:
        segs = segs.join(tombs, "range_id", "left")

    def explode(batches):
        for pdf in batches:
            outs = []
            for row in pdf.itertuples():
                docs, tfs, dls = decode_postings(row)
                dead = _dead_ids(row, int(row.gen))
                if dead is not None:
                    keep = ~np.isin(docs, dead)
                    docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
                if len(docs):
                    outs.append(pd.DataFrame(
                        {"term": row.term, "doc_id": docs, "tf": tfs, "dl": dls}))
            yield pd.concat(outs) if outs else pd.DataFrame(
                {"term": pd.Series(dtype="str"), "doc_id": pd.Series(dtype="int64"),
                 "tf": pd.Series(dtype="int64"), "dl": pd.Series(dtype="int64")})

    return segs.mapInPandas(explode, "term string, doc_id long, tf long, dl long")


def compact(spark: SparkSession, index_dir: str, cfg: IndexConfig,
            new_gen: int, publish: bool = True) -> dict:
    """Rewrite the whole published chain as single generation ``new_gen``."""
    import time

    t0 = time.monotonic()
    chain = mf.manifest_chain(index_dir)
    if not chain:
        raise ValueError("nothing to compact")
    from mee_spark.config import check_layout, layout_record

    check_layout(cfg, chain)  # same footgun as the query path: range_id
    # bucketing of tombstones must use the build-time doc_range_size
    gens = [m["generation"] for m in chain]
    if new_gen <= max(gens):
        raise ValueError(
            f"compaction target {new_gen} must exceed the chain's max "
            f"({max(gens)}); generation numbers order last-writer-wins")
    postings = decoded_postings(spark, index_dir, gens, cfg.doc_range_size)
    os.makedirs(mf.gen_dir(index_dir, new_gen), exist_ok=True)
    # consolidated docmap = live rows only
    live = live_docmap(spark, index_dir, gens)
    live.write.mode("overwrite").parquet(_docmap_path(index_dir, new_gen))
    part_metrics = build_segments(postings, cfg, index_dir, new_gen, resume=True)
    tail = chain[-1]
    wall = time.monotonic() - t0
    m = mf.write_manifest(
        index_dir, new_gen, parent=None,
        n_docs_live=tail["n_docs_live"], sum_dl_live=tail["sum_dl_live"],
        metrics={"kind": "compaction", "wall_sec": wall,
                 "compacted_gens": gens, "partitions": part_metrics},
        lineage={"compacted_from": gens},
        extra={"config": layout_record(cfg)},
    )
    if publish:
        mf.publish(index_dir, new_gen)
    return m
