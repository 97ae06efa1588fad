"""SPIMI segment build: posting runs → compressed per-(bucket, docID-range)
Parquet files with per-partition checkpoints and throughput metrics.

Spark does the partitioning/shuffle; numpy does the index-structure work
inside ``applyInPandas`` groups. Partitioning scheme (the scale story):

* ``range_id = doc_id // doc_range_size`` — explicit docID range
  partitioning. Every (term, range) posting run is ≤ doc_range_size
  postings, so head-term skew ("the" in 30%+ of docs) is CAPPED BY
  CONSTRUCTION: a 10^12-doc posting list becomes ~10^6 independent,
  bounded runs. This is the salting of the segment shuffle — the salt is
  the docID range, which (unlike a random salt) keeps every run sorted
  and directly concatenable at query time.
* ``bucket = xxhash64(term) % num_term_buckets`` — file layout key.
  Segment files live under ``bucket=<b>/`` so a query's term set prunes
  to the matching bucket directories (Spark partition-column pruning),
  and the ``term`` predicate prunes row groups within files (rows are
  written term-sorted).

Resumability (mee T1, `services/listenservice.py:160-182` reframed):
each (bucket, range) group writes its Parquet file, then a `.done`
checkpoint marker with its metrics. A rerun anti-joins the completed
(bucket, range) set *before the shuffle*, so recovered work skips both
the write and the shuffle of already-durable groups.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mee_spark import manifest as mf
from mee_spark.codec import encode_postings
from mee_spark.config import IndexConfig

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("range_id", pa.int64()),
        ("df_local", pa.int64()),
        ("n_postings", pa.int64()),
        ("doc_ids_blob", pa.binary()),
        ("tfs_blob", pa.binary()),
        ("dls_blob", pa.binary()),
        ("block_last_doc", pa.list_(pa.int64())),
        ("block_max_tf", pa.list_(pa.int64())),
        ("block_min_dl", pa.list_(pa.int64())),
    ]
)

METRICS_SCHEMA = StructType(
    [
        StructField("bucket", LongType()),
        StructField("range_id", LongType()),
        StructField("n_terms", LongType()),
        StructField("n_postings", LongType()),
        StructField("wall_sec", DoubleType()),
        StructField("bytes_written", LongType()),
    ]
)

SEGMENT_READ_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("range_id", LongType()),
        StructField("df_local", LongType()),
        StructField("n_postings", LongType()),
        StructField("doc_ids_blob", BinaryType()),
        StructField("tfs_blob", BinaryType()),
        StructField("dls_blob", BinaryType()),
        StructField("block_last_doc", ArrayType(LongType())),
        StructField("block_max_tf", ArrayType(LongType())),
        StructField("block_min_dl", ArrayType(LongType())),
    ]
)


def with_partition_keys(postings: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Attach (bucket, range_id) — the shuffle/layout keys."""
    return postings.withColumn(
        "range_id", (F.col("doc_id") / F.lit(cfg.doc_range_size)).cast("long")
    ).withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("term")), F.lit(cfg.num_term_buckets)).cast("long")
    )


def _make_writer(seg_root: str, ckpt_root: str, block_size: int):
    """Group fn for applyInPandas: one (bucket, range) group → one file."""

    def write_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bucket, range_id = int(key[0]), int(key[1])
        t0 = time.monotonic()
        pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
        terms, rows = [], []
        doc = pdf["doc_id"].to_numpy(np.int64)
        tf = pdf["tf"].to_numpy(np.int64)
        dl = pdf["dl"].to_numpy(np.int64)
        term_arr = pdf["term"].to_numpy()
        # term run boundaries (vectorized)
        change = np.flatnonzero(term_arr[1:] != term_arr[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(term_arr)]))
        n_post = 0
        for s, e in zip(starts, ends):
            enc = encode_postings(doc[s:e], tf[s:e], dl[s:e], block_size)
            enc["term"] = term_arr[s]
            enc["range_id"] = range_id
            enc["df_local"] = int(e - s)
            rows.append(enc)
            n_post += e - s
            terms.append(term_arr[s])
        table = pa.Table.from_pylist(rows, schema=SEGMENT_SCHEMA)
        bucket_dir = os.path.join(seg_root, f"bucket={bucket}")
        os.makedirs(bucket_dir, exist_ok=True)
        final = os.path.join(bucket_dir, f"range_{range_id}.parquet")
        tmp = final + f".{uuid.uuid4().hex}.tmp"
        pq.write_table(table, tmp, compression="zstd")  # rows already term-sorted
        os.replace(tmp, final)  # idempotent under task retry / speculation
        wall = time.monotonic() - t0
        metrics = dict(bucket=bucket, range_id=range_id, n_terms=len(rows),
                       n_postings=int(n_post), wall_sec=wall,
                       bytes_written=int(os.path.getsize(final)))
        os.makedirs(ckpt_root, exist_ok=True)
        ck_tmp = os.path.join(ckpt_root, f".{uuid.uuid4().hex}.tmp")
        with open(ck_tmp, "w") as f:
            json.dump(metrics, f)
        os.replace(ck_tmp, os.path.join(ckpt_root, mf.checkpoint_name(bucket, range_id)))
        return pd.DataFrame([metrics])[
            ["bucket", "range_id", "n_terms", "n_postings", "wall_sec", "bytes_written"]
        ]

    return write_group


def build_segments(
    postings: DataFrame, cfg: IndexConfig, index_dir: str, gen: int,
    resume: bool = True,
) -> list[dict]:
    """Write compressed segments for gen; returns per-partition metrics.

    ``postings`` carries (term, doc_id, tf, dl). Resume: already-
    checkpointed (bucket, range) groups are filtered out pre-shuffle.
    """
    seg_root = mf.segments_dir(index_dir, gen)
    ckpt_root = mf.checkpoints_dir(index_dir, gen)
    # a deletion-only delta has zero postings; the dir must still exist
    os.makedirs(seg_root, exist_ok=True)
    keyed = with_partition_keys(postings, cfg)
    done = mf.completed_checkpoints(index_dir, gen) if resume else set()
    if done:
        spark = postings.sparkSession
        done_df = F.broadcast(
            spark.createDataFrame(sorted(done), "bucket long, range_id long")
        )
        keyed = keyed.join(done_df, ["bucket", "range_id"], "left_anti")
    writer = _make_writer(seg_root, ckpt_root, cfg.block_size)
    metrics_df = keyed.groupBy("bucket", "range_id").applyInPandas(writer, METRICS_SCHEMA)
    fresh = [r.asDict() for r in metrics_df.collect()]
    # full metrics picture = fresh + previously checkpointed
    if done:
        for b, r in sorted(done):
            with open(os.path.join(ckpt_root, mf.checkpoint_name(b, r))) as f:
                fresh.append(json.load(f))
    return fresh


def read_segments(spark, index_dir: str, gens: list[int]) -> DataFrame:
    """Union of segment rows across generations with a ``gen`` column.

    Reads with explicit schema + bucket partition discovery; the caller
    filters (bucket, term) so Parquet gets partition + row-group pruning.
    """
    import glob

    full_schema = SEGMENT_READ_SCHEMA.add(StructField("bucket", LongType()))
    dfs = []
    for g in gens:
        root = mf.segments_dir(index_dir, g)
        # deletion-only generations have no segment files at all
        if not glob.glob(os.path.join(root, "bucket=*", "*.parquet")):
            continue
        df = (
            spark.read.option("basePath", root)
            .schema(full_schema)
            .parquet(root)
            .withColumn("gen", F.lit(g).cast("long"))
        )
        dfs.append(df)
    if not dfs:
        return spark.createDataFrame([], full_schema.add(StructField("gen", LongType())))
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out
