"""Corpus source abstraction: Iceberg table or Parquet directory.

The design input is an Iceberg table of pages (BASELINE.json input_hint);
this sandbox has no Iceberg runtime jar, so one reader function accepts
either and the rest of the engine never cares (SURVEY.md §7.2 risk item).
Snapshot semantics degrade gracefully: with Iceberg, incremental builds
read the snapshot range; with Parquet directories, each generation dir IS
the snapshot and the differ works off content hashes (build.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.SparkTable")
        return True
    except Exception:
        return False


def read_pages(
    spark: SparkSession,
    source: str,
    snapshot_id: int | None = None,
    start_snapshot_id: int | None = None,
) -> DataFrame:
    """Read the pages corpus from an Iceberg table name or a Parquet path.

    * ``source`` containing ``/`` or ending in ``.parquet`` → Parquet path.
    * otherwise → Iceberg table name; ``snapshot_id`` pins a time-travel
      read, ``start_snapshot_id`` reads the incremental append range
      (the CDC role mee's binlog listener played,
      `services/listenservice.py:91-158`).
    """
    looks_like_path = "/" in source or source.endswith(".parquet")
    if not looks_like_path and iceberg_available(spark):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if start_snapshot_id is not None:
            reader = reader.option("start-snapshot-id", str(start_snapshot_id))
        return reader.load(source)
    if not looks_like_path:
        # table name without Iceberg runtime: try the session catalog
        return spark.read.table(source)
    if snapshot_id is not None or start_snapshot_id is not None:
        raise ValueError(
            "snapshot options need an Iceberg source; Parquet generations "
            "are diffed by content hash instead (build_incremental)")
    return spark.read.parquet(source)
