"""spark-submit entry points.

Cluster usage (the north-rule deployment shape):

    # package the engine for executors
    python -m mee_spark.cli package --out mee_spark.zip

    spark-submit --py-files mee_spark.zip build_index.py \\
        --pages s3://bucket/pages/ --index s3://bucket/index/ --gen 1

    spark-submit --py-files mee_spark.zip query_index.py \\
        --index s3://bucket/index/ --query "spark query engine" --k 10

Locally the same scripts run on local[N]. The SparkSession is taken
from the environment (spark-submit provides master/executors); only
app-level confs (AQE, shuffle partitions) are set here.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import zipfile

from pyspark.sql import SparkSession

from mee_spark.config import IndexConfig


def make_session(app: str, shuffle_partitions: int | None = None) -> SparkSession:
    b = (SparkSession.builder.appName(app)
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true"))
    if shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if not os.environ.get("SPARK_ENV_LOADED") and "spark.master" not in os.environ:
        b = b.master(os.environ.get("MEE_SPARK_MASTER", "local[*]"))
    return b.getOrCreate()


def cfg_from_args(args) -> IndexConfig:
    return IndexConfig(
        index_dir=args.index,
        num_doc_partitions=args.partitions,
        num_term_buckets=args.buckets,
        doc_range_size=args.range_size,
        lang_filter=getattr(args, "lang", None),
    )


def cmd_build(args) -> None:
    from mee_spark.build import build_full_index, build_incremental
    from mee_spark import manifest as mf

    spark = make_session("mee-build", args.partitions)
    pages = spark.read.parquet(args.pages)
    cfg = cfg_from_args(args)
    if not mf.acquire_lock(args.index):
        sys.exit("another writer holds the index lock (_LOCK)")
    try:
        if args.incremental:
            gen = (mf.current_gen(args.index) or 0) + 1
            m = build_incremental(spark, pages, cfg, args.index, gen=gen,
                                  use_html=not args.text_only,
                                  lineage={"source": args.pages})
        else:
            m = build_full_index(spark, pages, cfg, args.index, gen=args.gen,
                                 use_html=not args.text_only,
                                 lineage={"source": args.pages})
    finally:
        mf.release_lock(args.index)
    print(json.dumps(m["metrics"] | {"generation": m["generation"]}))


def cmd_query(args) -> None:
    from mee_spark.query_wand import bm25_topk_wand

    spark = make_session("mee-query", args.partitions)
    queries = spark.createDataFrame(
        [(0, args.query, args.k)], "query_id int, query_text string, k int")
    res = bm25_topk_wand(spark, args.index, queries, cfg_from_args(args))
    for r in res.orderBy("rank").collect():
        print(json.dumps({"rank": r["rank"], "doc_id": r["doc_id"], "score": r["score"]}))


def cmd_compact(args) -> None:
    from mee_spark import manifest as mf
    from mee_spark.merge import compact, compaction_due, maybe_compact

    if args.if_needed:
        # policy probe first: metadata-only, so the common "chain is
        # healthy" case never pays a SparkSession
        decision = compaction_due(
            args.index, max_chain_len=args.max_chain,
            max_tombstone_ratio=args.max_tombstone_ratio)
        if not decision["due"]:
            print(json.dumps({"compacted": False} | decision))
            return
        spark = make_session("mee-compact", args.partitions)
        if not mf.acquire_lock(args.index):
            sys.exit("another writer holds the index lock (_LOCK)")
        try:
            m = maybe_compact(spark, args.index, cfg_from_args(args),
                              max_chain_len=args.max_chain,
                              max_tombstone_ratio=args.max_tombstone_ratio)
        finally:
            mf.release_lock(args.index)
        if m is None:  # raced: another maintainer compacted between probes
            print(json.dumps({"compacted": False} | decision))
            return
        print(json.dumps({"compacted": True} | m["metrics"]
                         | {"generation": m["generation"]}))
        return
    spark = make_session("mee-compact", args.partitions)
    if not mf.acquire_lock(args.index):
        sys.exit("another writer holds the index lock (_LOCK)")
    try:
        gen = (mf.current_gen(args.index) or 0) + 1
        m = compact(spark, args.index, cfg_from_args(args), new_gen=gen)
    finally:
        mf.release_lock(args.index)
    print(json.dumps(m["metrics"] | {"generation": m["generation"]}))


def cmd_reset(args) -> None:
    from mee_spark import manifest as mf

    mf.reset_incomplete(args.index, args.gen)
    print(json.dumps({"reset": args.gen}))


def cmd_clean(args) -> None:
    from mee_spark import manifest as mf

    print(json.dumps({"removed": mf.gc_orphans(args.index, ttl_sec=args.ttl)}))


def cmd_package(args) -> None:
    """Zip the package for spark-submit --py-files."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "mee_spark")
    with zipfile.ZipFile(args.out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    print(json.dumps({"wrote": args.out}))


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="mee_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, needs_index=True):
        if needs_index:
            sp.add_argument("--index", required=True)
        sp.add_argument("--partitions", type=int, default=128)
        sp.add_argument("--buckets", type=int, default=32)
        sp.add_argument("--range-size", type=int, default=1 << 20)

    b = sub.add_parser("build"); common(b)
    b.add_argument("--pages", required=True)
    b.add_argument("--gen", type=int, default=1)
    b.add_argument("--incremental", action="store_true")
    b.add_argument("--text-only", action="store_true",
                   help="corpus has no html column; index the text column")
    b.add_argument("--lang", default=None)
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query"); common(q)
    q.add_argument("--query", required=True)
    q.add_argument("--k", type=int, default=10)
    q.set_defaults(fn=cmd_query)

    c = sub.add_parser("compact"); common(c)
    c.add_argument("--if-needed", action="store_true",
                   help="compact only when the manifest-driven policy "
                        "fires (chain length / tombstone ratio)")
    c.add_argument("--max-chain", type=int, default=8)
    c.add_argument("--max-tombstone-ratio", type=float, default=0.2)
    c.set_defaults(fn=cmd_compact)

    r = sub.add_parser("reset"); common(r)
    r.add_argument("--gen", type=int, required=True)
    r.set_defaults(fn=cmd_reset)

    g = sub.add_parser("clean"); common(g)
    g.add_argument("--ttl", type=float, default=0.0)
    g.set_defaults(fn=cmd_clean)

    z = sub.add_parser("package"); z.add_argument("--out", default="mee_spark.zip")
    z.set_defaults(fn=cmd_package)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
