"""Structured Streaming ingestion — mee's listen/sync loop, Spark-native.

The reference tails a MySQL binlog into Kafka and applies events one at
a time (`services/listenservice.py:91-158`, `services/syncservice.py:
53-114`). Here the stream is a Structured Streaming source of page rows
(file source locally; Kafka/Iceberg CDC on a cluster — same plan), and
each micro-batch runs the SAME incremental builder as the batch path via
``foreachBatch`` — one code path for batch and streaming (T2: idempotent
at-least-once application; a replayed batch re-diffs against the live
docmap and produces an empty delta).

Also provided: a watermarked event-time aggregation (pages per language
per window) — the streaming-stats operator the reference lacks entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mee_spark.build import build_incremental
from mee_spark.config import IndexConfig
from mee_spark.fixtures import PAGES_SCHEMA


def read_page_stream(spark: SparkSession, source_dir: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of page rows (drop parquet files into
    ``source_dir``). One backend of ``page_stream_source``."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def page_stream_source(
    spark: SparkSession,
    kind: str = "files",
    *,
    source_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    rows_per_second: int = 200,
    kafka_bootstrap: str | None = None,
    kafka_topic: str | None = None,
) -> DataFrame:
    """The event-bus switch point (mee S3, `services/listenservice.py:
    192-220`): three backends, ONE page-row schema, so every downstream
    operator (stateful dedup, windowed stats, incremental indexing) is
    source-agnostic — the swap is demonstrated by tests running the same
    pipeline over two backends, not asserted in a comment.

    * ``files`` — parquet drop-dir (exactly-once file tracking; local/dev).
    * ``rate``  — Spark's built-in rate source as an embedded broker
      stand-in (infinite, ordered, replayable offsets); each offset is
      deterministically synthesized into a page row via the fixture
      generator, so outputs are byte-reproducible.
    * ``kafka`` — the real broker: value = JSON page payload (html
      base64-encoded). Requires the spark-sql-kafka connector jar; absence
      raises at plan time, which tests turn into a skip.
    """
    if kind == "files":
        if not source_dir:
            raise ValueError("files source needs source_dir")
        return read_page_stream(spark, source_dir, max_files_per_trigger)
    if kind == "rate":
        import pandas as pd

        from mee_spark.fixtures import gen_pages_for_indices

        raw = (spark.readStream.format("rate")
               .option("rowsPerSecond", rows_per_second).load())

        def synth(batches):
            for pdf in batches:
                if len(pdf):
                    yield gen_pages_for_indices(pdf["value"].to_numpy())
                else:
                    yield pd.DataFrame(
                        {f.name: pd.Series(dtype="object") for f in PAGES_SCHEMA})

        return raw.select("value").mapInPandas(synth, PAGES_SCHEMA)
    if kind == "kafka":
        if not (kafka_bootstrap and kafka_topic):
            raise ValueError("kafka source needs kafka_bootstrap and kafka_topic")
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", kafka_bootstrap)
            .option("subscribe", kafka_topic)
            .option("startingOffsets", "earliest")
            .load()
        )
        payload = ("url string, warc_ts timestamp, html_b64 string, "
                   "text string, lang string")
        return (
            raw.select(F.from_json(F.col("value").cast("string"), payload).alias("p"))
            .select(F.col("p.url").alias("url"), F.col("p.warc_ts").alias("warc_ts"),
                    F.unbase64(F.col("p.html_b64")).alias("html"),
                    F.col("p.text").alias("text"), F.col("p.lang").alias("lang"))
        )
    raise ValueError(f"unknown page stream source kind: {kind!r}")


def incremental_index_stream(
    spark: SparkSession, source_dir: str, index_dir: str, cfg: IndexConfig,
    checkpoint_dir: str, available_now: bool = True,
    source: DataFrame | None = None,
) -> StreamingQuery:
    """Stream pages → incremental index generations.

    Each micro-batch becomes one generation via the batch incremental
    builder; Structured Streaming's checkpoint gives exactly-once batch
    tracking (mee's Kafka offset cache, `basecosumerservice.py:36-53`),
    and the builder's own snapshot-diff makes replays idempotent.

    ``source``: any streaming DataFrame of page rows (e.g. from
    ``page_stream_source``) — defaults to the file backend over
    ``source_dir``. The indexing plan is identical for every backend."""
    from mee_spark import manifest as mf

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cur = mf.current_gen(index_dir)
        if cur is not None:
            # partial=True: a micro-batch is an upsert set, not a snapshot
            build_incremental(spark, batch_df, cfg, index_dir, gen=cur + 1,
                              partial=True, lineage={"stream_batch": batch_id})
        else:
            from mee_spark.build import build_full_index
            build_full_index(spark, batch_df, cfg, index_dir, gen=1,
                             lineage={"stream_batch": batch_id})

    stream = source if source is not None else read_page_stream(spark, source_dir)
    writer = (
        stream
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stateful_url_dedup(pages_stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: emit each url
    at most once across ALL micro-batches (a streaming exact-dedup front
    for the indexer — the at-least-once event stream becomes
    effectively-once, mee's T2 concern `basecosumerservice.py:36-53`).

    State per url-hash-prefix group = the set of seen FULL urls (exact:
    a 64-bit hash alone would silently drop a distinct doc on collision,
    and collisions are likely well below 10^12 docs). Keys are a 12-bit
    hash prefix so state shards evenly across executors and each group's
    state stays small relative to the corpus (at 10^12 docs you raise the
    prefix width; the operator shape is identical — a Bloom filter swap
    would trade exactness for space and is deliberately NOT used here).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = pages_stream.withColumn(
        "shard", F.pmod(F.xxhash64("url"), F.lit(4096)).cast("int"))

    out_schema = ("shard int, url string, warc_ts timestamp, html binary, "
                  "text string, lang string")
    state_schema = "seen array<string>"

    def dedup(key, pdfs, state):
        seen = set(state.get[0]) if state.exists else set()
        outs = []
        for pdf in pdfs:
            # single pass: dedup against state AND within the batch
            fresh_mask = []
            for u in pdf["url"]:
                if u in seen:
                    fresh_mask.append(False)
                else:
                    seen.add(u)
                    fresh_mask.append(True)
            new = pdf[pd.Series(fresh_mask, index=pdf.index).to_numpy()]
            if len(new):
                outs.append(new)
        state.update((list(seen),))
        if outs:
            yield pd.concat(outs)

    return keyed.groupBy("shard").applyInPandasWithState(
        dedup, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout)


def windowed_lang_counts(pages_stream: DataFrame, window: str = "1 minute",
                         watermark: str = "2 minutes") -> DataFrame:
    """Watermarked tumbling-window counts by language — late rows beyond
    the watermark are dropped, state is bounded (the event-time operator
    family mee has no analog for)."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("window_start"), "lang", "n_pages")
    )
