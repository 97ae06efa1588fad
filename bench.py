"""Benchmark harness — prints ONE JSON line.

Measures:
  * per-query wall time for the driver-contract queries at
    $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
    local[$SPARK_GRAFT_CPUS];
  * full index-build throughput (docs/sec) + BM25/WAND batch query
    latency on a deterministic synthetic pages corpus;
  * scaling efficiency between N and 4N cores (local[N] vs local[4N]) on
    the identical on-disk corpus — the sandbox stand-in for N vs 4N
    executors (BASELINE.md protocol): efficiency = (thr_4N / thr_N) / 4.

Protocol notes: the corpus is generated once to parquet (untimed) and
read identically by both scaling sessions; each session runs one untimed
warmup build (JIT/Arrow worker warmup — cold-vs-warm is a 4x effect on
local mode) before the timed build. Partition counts are fixed at
>= 4 x max cores for both levels.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("MEE_BENCH_DOCS", "60000"))
WARMUP_DOCS = int(os.environ.get("MEE_BENCH_WARMUP_DOCS", "8000"))
SCALING_N = int(os.environ.get("MEE_BENCH_N", str(max(1, CPUS // 4))))
PARTITIONS = 4 * CPUS

# contract queries timed at SF_DIR (skip the quadratic all-pairs ones at bench scale)
TIMED_QUERIES = [
    "fulltext_bm25_topk", "fulltext_postings", "fulltext_term_df",
    "text_quality", "text_langid", "text_fingerprint",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "ann_bruteforce", "ann_lsh",
    "rel_lookup_join", "rel_multihop_join", "rel_nested_collect",
    "rel_filter_predicates", "rel_topk_per_group", "rel_diff_lag",
]


def make_session(cores: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"mee-bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def time_queries(spark: SparkSession) -> dict[str, float]:
    import __spark_entry__ as em

    qs = em.queries()
    out = {}
    # warmup: touch every table + python workers
    qs["fulltext_corpus_stats"](spark, SF_DIR).collect()
    for name in TIMED_QUERIES:
        t0 = time.monotonic()
        n = qs[name](spark, SF_DIR).count()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def build_and_query(spark: SparkSession, corpus_path: str, index_dir: str,
                    n_docs: int) -> dict:
    from mee_spark.build import build_full_index
    from mee_spark.config import IndexConfig
    from mee_spark.fixtures import gen_queries
    from mee_spark.query_wand import bm25_topk_wand

    cfg = IndexConfig(num_doc_partitions=PARTITIONS, num_term_buckets=32,
                      doc_range_size=1 << 13)
    pages = spark.read.parquet(corpus_path)
    t0 = time.monotonic()
    build_full_index(spark, pages, cfg, index_dir, gen=1, resume=False)
    build_sec = time.monotonic() - t0
    queries = gen_queries(spark, 100)
    t0 = time.monotonic()
    n_res = bm25_topk_wand(spark, index_dir, queries, cfg).count()
    query_sec = time.monotonic() - t0
    return {
        "build_sec": round(build_sec, 2),
        "docs_per_sec": round(n_docs / build_sec, 1),
        "query_batch_sec": round(query_sec, 2),
        "sec_per_query": round(query_sec / 100, 4),
        "topk_rows": n_res,
    }


def main() -> None:
    work = tempfile.mkdtemp(prefix="mee_bench_")
    corpus = os.path.join(work, "pages.parquet")
    warm_corpus = os.path.join(work, "warm.parquet")
    results: dict = {"sf_dir": SF_DIR, "cpus": CPUS, "bench_docs": BENCH_DOCS}

    # ---- session at full parallelism: contract queries + corpus generation
    spark = make_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    from mee_spark.fixtures import gen_pages

    gen_pages(spark, BENCH_DOCS, num_partitions=PARTITIONS).write.mode(
        "overwrite").parquet(corpus)
    gen_pages(spark, WARMUP_DOCS, num_partitions=PARTITIONS).write.mode(
        "overwrite").parquet(warm_corpus)
    queries_sec = time_queries(spark)
    # warmup + timed build at 4N
    build_and_query(spark, warm_corpus, os.path.join(work, "wu32"), WARMUP_DOCS)
    hi = build_and_query(spark, corpus, os.path.join(work, "ix32"), BENCH_DOCS)
    spark.stop()

    # ---- session at N cores: warmup + timed build on the identical corpus
    spark = make_session(SCALING_N)
    spark.sparkContext.setLogLevel("ERROR")
    build_and_query(spark, warm_corpus, os.path.join(work, "wuN"), WARMUP_DOCS)
    lo = build_and_query(spark, corpus, os.path.join(work, "ixN"), BENCH_DOCS)
    spark.stop()

    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (CPUS / SCALING_N)
    results.update({
        "index_build": {f"local[{CPUS}]": hi, f"local[{SCALING_N}]": lo},
        "scaling_efficiency": round(eff, 3),
        "queries": queries_sec,
    })
    total = round(sum(queries_sec.values()) + hi["build_sec"] + hi["query_batch_sec"], 2)
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({
        "metric": "index-build docs/sec + BM25 topk latency + scaling efficiency",
        "value": total,
        "unit": "sec",
        "sf": SF_DIR,
        "queries": queries_sec,
        "index_build_docs_per_sec": hi["docs_per_sec"],
        "sec_per_query": hi["sec_per_query"],
        "scaling": results["index_build"],
        "scaling_efficiency": results["scaling_efficiency"],
    }))


if __name__ == "__main__":
    sys.exit(main())
