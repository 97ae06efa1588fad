"""Recommended Spark conf for mee_spark workloads.

Why this exists (measured, round 3): with AQE's default
``coalescePartitions.parallelismFirst=true`` Spark coalesces every
post-shuffle stage to roughly ``defaultParallelism`` partitions — i.e.
~1.1 waves. A 9-task stage on 8 cores leaves 7 cores idle for the whole
second wave (~40% of the stage), and oversized coalesced partitions
spill + GC-thrash (measured 2.2x total CPU inflation on the 300k-doc
index build; the fix cut one stage from 26.8s/9 tasks to 1.5s/32 tasks).
The same quantization argument holds on a 1000-executor cluster: target
several WAVES of modest partitions per stage, not one partition per
core. ``parallelismFirst=false`` + a small advisory size gives every
stage >=4 waves, so stragglers and the last-wave tail amortize.
"""

from __future__ import annotations


def recommended_conf(cores: int, shuffle_partitions: int | None = None) -> dict:
    """Conf dict for SparkSession.builder.config(map=...) — sized so each
    shuffle stage runs in multiple waves on ``cores`` parallel slots."""
    return {
        "spark.sql.shuffle.partitions": str(shuffle_partitions or 4 * cores),
        "spark.sql.adaptive.enabled": "true",
        # waves, not one-partition-per-core (see module docstring)
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        # scan splits small enough that pre-shuffle stages also get waves
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.files.openCostInBytes": "131072",
    }
