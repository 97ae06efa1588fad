"""Source-backend swap evidence (mee S3) + at-least-once retry proof (T7).

S3: the round-1 claim "Kafka is a one-line swap" becomes evidence — the
SAME downstream pipeline runs over the file backend and the rate backend
(an embedded broker stand-in with ordered replayable offsets), producing
byte-identical page rows; the kafka backend is constructed for real and
skips only when the connector jar is absent from the sandbox.

T7: mee retries failed applies (`commonhandler.py:110-130`); our
equivalent is Spark task retry over idempotent atomic-rename segment
writes. The test injects real task deaths (first attempt of every
segment-writer task raises) under a retry-enabled master and proves the
finished index is identical to an uninjected build — not just "no crash".
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from mee_spark.fixtures import gen_pages, gen_pages_for_indices
from mee_spark.streaming import page_stream_source, windowed_lang_counts

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _drain_memory_stream(spark, stream_df, name: str, min_rows: int,
                         timeout_s: float = 90.0):
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    try:
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            if spark.sql(f"SELECT count(*) c FROM {name}").collect()[0]["c"] >= min_rows:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)
    return spark.sql(f"SELECT * FROM {name}")


def test_rate_backend_rows_byte_identical(spark, tmp_path):
    """Rate-source pages == fixture-generated pages for the same offsets:
    the backend swap changes WHERE rows come from, not WHAT they are."""
    out = _drain_memory_stream(
        spark, page_stream_source(spark, "rate", rows_per_second=500),
        "ratepages", min_rows=20)
    rows = out.limit(50).collect()
    assert len(rows) >= 20
    idx = [int(r["url"].rsplit("/", 1)[1]) for r in rows]
    expected = gen_pages_for_indices(idx)
    for r, (_, e) in zip(rows, expected.iterrows()):
        assert r["url"] == e["url"]
        assert r["text"] == e["text"]
        assert bytes(r["html"]) == bytes(e["html"])
        assert r["lang"] == e["lang"]
        assert r["warc_ts"] == e["warc_ts"].to_pydatetime()


def test_same_pipeline_over_file_and_rate_backends(spark, tmp_path):
    """windowed_lang_counts runs UNCHANGED over two different backends —
    the operator never sees which source produced its input."""
    src_dir = str(tmp_path / "drop")
    os.makedirs(src_dir)
    gen_pages(spark, 300, num_partitions=2).write.mode("overwrite").parquet(
        os.path.join(src_dir, "batch0.parquet"))

    results = {}
    for kind, kwargs, min_rows in (
        ("files", {"source_dir": os.path.join(src_dir, "batch0.parquet")}, 1),
        ("rate", {"rows_per_second": 500}, 1),
    ):
        stream = page_stream_source(spark, kind, **kwargs)
        agg = windowed_lang_counts(stream, window="10 minutes", watermark="0 seconds")
        name = f"langcounts_{kind}"
        q = (agg.writeStream.format("memory").queryName(name)
             .outputMode("complete").start())
        try:
            deadline = time.monotonic() + 90
            while time.monotonic() < deadline:
                n = spark.sql(f"SELECT coalesce(sum(n_pages),0) s FROM {name}").collect()[0]["s"]
                if n and n >= 100:
                    break
                time.sleep(0.5)
        finally:
            q.stop()
            q.awaitTermination(30)
        results[kind] = {r["lang"] for r in spark.sql(f"SELECT DISTINCT lang FROM {name}").collect()}
    # both backends drive the same aggregation to the same language set
    assert results["files"] == results["rate"] != set()


def test_kafka_backend_constructs_or_skips(spark):
    """The kafka reader is constructed for real (format, subscribe, JSON
    payload projection). Sandbox has no connector jar → plan-time error →
    skip; on a cluster with the jar this test exercises the real path."""
    try:
        df = page_stream_source(spark, "kafka",
                                kafka_bootstrap="localhost:9092",
                                kafka_topic="pages")
    except Exception as e:  # connector absent: fail at plan time
        pytest.skip(f"kafka connector unavailable in sandbox: {type(e).__name__}")
    assert set(df.columns) == {"url", "warc_ts", "html", "text", "lang"}


_FAULT_SCRIPT = r"""
import os, sys, tempfile, json
sys.path.insert(0, sys.argv[1])
from pyspark.sql import SparkSession
import mee_spark.segments as seg
from mee_spark.build import build_full_index
from mee_spark.config import IndexConfig
from mee_spark.fixtures import gen_pages, gen_queries
from mee_spark.query_wand import bm25_topk_wand

marker_dir = tempfile.mkdtemp(prefix="fault_markers_")
orig = seg._make_writer

_groups_seen = {}

def injecting(seg_root, ckpt_root, block_size):
    inner = orig(seg_root, ckpt_root, block_size)
    def wrap(key, pdf):
        import os as _os
        from pyspark import TaskContext
        tc = TaskContext.get()
        if tc is not None and tc.attemptNumber() == 0:
            kid = (tc.partitionId(), tc.attemptNumber())
            _groups_seen[kid] = _groups_seen.get(kid, 0) + 1
            # die AFTER the first group's file+checkpoint are durable: the
            # retried attempt re-executes the whole task, so the already-
            # written group is rewritten — the torn mid-task state the
            # idempotent atomic-rename protocol must absorb
            if _groups_seen[kid] == 2:
                open(_os.path.join(marker_dir, str(tc.partitionId())), "w").close()
                raise RuntimeError("injected task death (first attempt)")
        return inner(key, pdf)
    return wrap

# local[2,4]: 2 cores, up to 4 attempts per task — the retry semantics a
# cluster scheduler provides (local default is maxFailures=1: fail-fast)
spark = (SparkSession.builder.master("local[2,4]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
cfg = IndexConfig(num_doc_partitions=4, num_term_buckets=4, doc_range_size=256)
pages = gen_pages(spark, 800, num_partitions=4)

seg._make_writer = injecting
ix_faulty = tempfile.mkdtemp(prefix="ix_faulty_")
build_full_index(spark, pages, cfg, ix_faulty, gen=1)
n_injected = len(os.listdir(marker_dir))

seg._make_writer = orig
ix_clean = tempfile.mkdtemp(prefix="ix_clean_")
build_full_index(spark, pages, cfg, ix_clean, gen=1)

qs = gen_queries(spark, 20)
a = sorted(map(tuple, bm25_topk_wand(spark, ix_faulty, qs, cfg).collect()))
b = sorted(map(tuple, bm25_topk_wand(spark, ix_clean, qs, cfg).collect()))
print(json.dumps({"injected": n_injected, "rows": len(a), "equal": a == b}))
spark.stop()
"""


def test_segment_writes_survive_injected_task_deaths():
    """T7 end-to-end: every segment-writer task dies on its first attempt;
    Spark retries it; the atomic-rename + checkpoint protocol makes the
    retried writes idempotent, and the finished index answers queries
    identically to a never-failed build."""
    out = subprocess.run(
        [sys.executable, "-c", _FAULT_SCRIPT, REPO],
        capture_output=True, text=True, timeout=600,
        env=os.environ | {"PYTHONPATH": REPO})
    assert out.returncode == 0, out.stderr[-3000:]
    import json

    rec = json.loads([ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1])
    assert rec["injected"] > 0, "no task deaths were injected"
    assert rec["rows"] > 0
    assert rec["equal"], "faulty-build query results differ from clean build"
