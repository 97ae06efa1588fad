"""Full + incremental index build drivers.

Full build = mee's `update.py` rebuild lifecycle (`services/
updateservice.py:47-80`): guard → build into a fresh generation →
atomic publish. Incremental build = mee's binlog sync (`services/
syncservice.py:53-114` + the 12-way event matrix in
`modules/handlers/v1/commonhandler.py:595-605`) reframed as snapshot
diffing: INSERT → new postings in a delta gen; UPDATE (changed text) →
tombstone old docID + fresh postings, keeping the docID since ``url``
(the anchor field, `handlerconfig.py:528-568`) is unchanged; DELETE →
tombstone only. No full rebuild, readers see the old gen until publish.

Everything the query engine needs later is durable per gen:
``docmap.parquet`` (url, doc_id, dl, text_hash), segment files,
``tombstones.parquet``, and a manifest with lineage + per-partition
throughput metrics.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mee_spark import manifest as mf
from mee_spark.config import IndexConfig
from mee_spark.docmap import assign_doc_ids

from mee_spark.segments import build_segments
from mee_spark.textprep import extract_text


def _docmap_path(index_dir: str, gen: int) -> str:
    return os.path.join(mf.gen_dir(index_dir, gen), "docmap.parquet")


def _tombstones_path(index_dir: str, gen: int) -> str:
    return os.path.join(mf.gen_dir(index_dir, gen), "tombstones.parquet")


def _with_text_hash(pages: DataFrame, use_html: bool) -> DataFrame:
    """Attach extracted text + its hash (the diff key, mee J5
    `commonhandler.py:164-170`: changed fields detection)."""
    text_col = extract_text(F.col("html")) if use_html else F.col("text")
    return pages.withColumn("_text", text_col).withColumn(
        "text_hash", F.xxhash64(F.col("_text"))
    )


def build_full_index(
    spark: SparkSession,
    pages: DataFrame,
    cfg: IndexConfig,
    index_dir: str,
    gen: int = 1,
    use_html: bool = True,
    resume: bool = True,
    lineage: dict | None = None,
    publish: bool = True,
) -> dict:
    """Full rebuild into ``gen``; atomic publish on success. Returns manifest."""
    t0 = time.monotonic()
    if cfg.lang_filter:
        pages = pages.filter(F.col("lang") == cfg.lang_filter)
    from mee_spark.textprep import tokenize_col

    os.makedirs(mf.gen_dir(index_dir, gen), exist_ok=True)
    docmap = assign_doc_ids(pages, cfg.num_doc_partitions)
    # single extraction pass feeds hash + tokens + doclen. The tokenized
    # corpus is STAGED TO PARQUET, not cached: an in-memory cache of the
    # token arrays OOMs long before web scale (it already dies at 300k
    # docs on a 24g local heap), while a columnar staging file is SPIMI's
    # classic on-disk run — sequential IO, memory-safe at any corpus size,
    # and the downstream passes (stats, docmap, postings) column-prune it.
    text_col = extract_text(F.col("html")) if use_html else F.col("text")
    docs_plan = (
        pages.select("url", text_col.alias("_text"))
        .withColumn("text_hash", F.xxhash64(F.col("_text")))
        .withColumn("tokens", tokenize_col(F.col("_text")))
        .withColumn("dl", F.size("tokens").cast("long"))
        .join(docmap, "url")
        .select("doc_id", "url", "tokens", "dl", "text_hash")
    )
    staging = os.path.join(mf.gen_dir(index_dir, gen), "_docs_staging.parquet")
    # observe() piggybacks the corpus stats on the staging write — one job
    # instead of two (every extra action costs serial driver time that
    # caps scaling efficiency)
    from pyspark.sql import Observation

    obs = Observation("corpus_stats")
    # snappy, not the session's zstd default (round 7, guide §6): staging
    # is a TRANSIENT spill consumed once and deleted at the end of this
    # build — the cheap-codec/bigger-file trade is the classic one for
    # intermediates, and the token arrays are what make this file large
    docs_plan.observe(obs, F.count(F.lit(1)).alias("n"),
                      F.sum("dl").alias("sum_dl"),
                      F.max("doc_id").alias("max_id")).write.mode(
        "overwrite").option("compression", "snappy").parquet(staging)
    n_docs = int(obs.get["n"])
    sum_dl = int(obs.get["sum_dl"] or 0)
    # the NEXT fresh docID, recorded in the manifest so incremental builds
    # can append without re-scanning the live docmap for max(doc_id)
    max_id = obs.get["max_id"]
    next_doc_id = int(max_id) + 1 if max_id is not None else 0
    docs = spark.read.parquet(staging)

    # docmap write and segment build are independent reads of the staging
    # file — run them as CONCURRENT Spark jobs (separate driver thread) so
    # the small docmap write hides inside the big segment shuffle instead
    # of adding a serial job to the build's Amdahl floor.
    import threading

    _docmap_err: list[BaseException] = []

    def _write_docmap() -> None:
        try:
            docs.select("url", "doc_id", "dl", "text_hash").write.mode(
                "overwrite").parquet(_docmap_path(index_dir, gen))
        except BaseException as e:  # surfaced after join()
            _docmap_err.append(e)

    dm_thread = threading.Thread(target=_write_docmap, daemon=True)
    dm_thread.start()
    try:
        # raw token instances straight into the (bucket, range) shuffle:
        # the writer aggregates tf itself (see _make_writer), so the
        # separate groupBy(term, doc_id).count() exchange the old
        # build_postings pass paid is gone — one posting-sized shuffle
        # instead of two (round 7, guide §2.4)
        raw = docs.select("doc_id", "dl", F.explode("tokens").alias("term"))
        part_metrics = build_segments(raw, cfg, index_dir, gen, resume=resume)
    finally:
        # join even on error: a same-gen retry (resume=True flow) must
        # never start while a stale daemon write of the SAME docmap path
        # is still in flight — interleaved writes corrupt the parquet
        dm_thread.join()
    if _docmap_err:
        raise _docmap_err[0]
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    wall = time.monotonic() - t0
    from mee_spark.config import layout_record

    m = mf.write_manifest(
        index_dir, gen, parent=None, n_docs_live=n_docs, sum_dl_live=sum_dl,
        metrics={
            "kind": "full", "wall_sec": wall, "docs_indexed": n_docs,
            "docs_per_sec": (n_docs / wall) if wall else 0.0,
            "partitions": part_metrics,
        },
        lineage=lineage or {},
        extra={"config": layout_record(cfg), "next_doc_id": next_doc_id},
    )
    if publish:
        mf.publish(index_dir, gen)
    return m


def build_incremental(
    spark: SparkSession,
    new_snapshot: DataFrame,
    cfg: IndexConfig,
    index_dir: str,
    gen: int,
    use_html: bool = True,
    resume: bool = True,
    lineage: dict | None = None,
    publish: bool = True,
    partial: bool = False,
) -> dict:
    """Delta build: diff ``new_snapshot`` against the live index state.

    Added urls get fresh docIDs (appended past the current max); changed
    urls keep their docID (anchor unchanged) but are tombstoned+re-added;
    missing urls are tombstoned. Merged at query time — no rebuild.

    ``partial=True`` treats the input as an upsert batch rather than a
    full snapshot: urls absent from it are NOT deletions (mee's event
    semantics — a DELETE is an explicit event, `commonhandler.py:
    860-938`; silence says nothing). Used by the streaming path.
    """
    t0 = time.monotonic()
    if cfg.lang_filter:
        new_snapshot = new_snapshot.filter(F.col("lang") == cfg.lang_filter)
    parent = mf.current_gen(index_dir)
    if parent is None:
        raise ValueError("no published index; run build_full_index first")
    chain = mf.manifest_chain(index_dir, parent)
    from mee_spark.config import check_layout, layout_record

    # layout identity is fixed at first build: a delta gen written with a
    # different doc_range_size/num_term_buckets would bucket tombstones and
    # prune term buckets against the wrong on-disk layout (silent data loss)
    check_layout(cfg, chain)
    # last-writer-wins masks compare GENERATION NUMBERS (a tombstone at
    # gen t kills postings of gens < t); a new gen numbered at or below
    # the chain's max would silently corrupt liveness
    max_gen = max(m["generation"] for m in chain)
    if gen <= max_gen:
        raise ValueError(
            f"generation {gen} must exceed the chain's max ({max_gen}); "
            "last-writer-wins is ordered by generation number")
    prev = live_docmap(spark, index_dir, [m["generation"] for m in chain])

    hashed = _with_text_hash(new_snapshot, use_html).select(
        "url", "_text", "text_hash"
    )
    diff = hashed.join(prev.select("url", F.col("doc_id").alias("old_doc_id"),
                                   F.col("dl").alias("old_dl"),
                                   F.col("text_hash").alias("old_hash")),
                       "url", "full_outer")
    added = diff.filter(F.col("old_doc_id").isNull())
    deleted = diff.filter(F.col("text_hash").isNull())
    if partial:
        deleted = deleted.limit(0)
    changed = diff.filter(
        F.col("old_doc_id").isNotNull() & F.col("text_hash").isNotNull()
        & (F.col("text_hash") != F.col("old_hash"))
    )

    # next fresh docID comes from the manifest chain — the newest manifest
    # records next_doc_id as of its own build, so no Spark job is spent
    # re-deriving max(doc_id) from the live docmap (that aggregate was a
    # whole serial job on the incremental path's Amdahl floor). Fallback
    # scan only for chains written before the field existed. IDs are
    # monotone across the chain and never recycled, even after mass
    # deletions — last-writer-wins masks compare generations, and a gap in
    # the id space costs nothing.
    start_id = chain[-1].get("next_doc_id")
    if start_id is None:
        max_id = prev.agg(F.max("doc_id")).collect()[0][0]
        start_id = int(max_id) + 1 if max_id is not None else 0
    added_ids = assign_doc_ids(added.select(F.col("url")), cfg.num_doc_partitions,
                               start_id=start_id)
    from mee_spark.textprep import tokenize_col

    delta_plan = (
        added.join(added_ids, "url")
        .select("url", "doc_id", "_text", "text_hash")
        .unionByName(
            changed.select("url", F.col("old_doc_id").alias("doc_id"), "_text", "text_hash")
        )
        .withColumn("tokens", tokenize_col(F.col("_text")))
        .withColumn("dl", F.size("tokens").cast("long"))
        .select("doc_id", "url", "tokens", "dl", "text_hash")
    )
    # stage to parquet, not cache — same memory-safety stance as the full
    # build (the delta of a 10^12-doc corpus is still huge). The delta's
    # corpus-stats ride the staging write via observe() — one job, not two.
    from pyspark.sql import Observation

    os.makedirs(mf.gen_dir(index_dir, gen), exist_ok=True)
    _staging = os.path.join(mf.gen_dir(index_dir, gen), "_docs_staging.parquet")

    # Four writes, two CONCURRENT phases instead of four serial actions
    # (round 7, guide §2.6 — each removed serial action is driver time on
    # the incremental path's Amdahl floor):
    #   phase 1: staging write ∥ tombstones write (independent branches
    #            of the same diff — tombstones never read staging);
    #   phase 2: docmap write ∥ segment build (both read the staging
    #            file, neither reads the other's output).
    # corpus stats delta (exact): N' = N + added − deleted; Σdl'
    # likewise, replacing changed docs' old dl with the new one. The
    # removed-docs aggregate RIDES the tombstones write via observe()
    # (the tombstone rows ARE the changed∪deleted set); the changed-count
    # rides along as a flag column.
    tomb_src = (
        changed.select(F.col("old_doc_id").alias("doc_id"), "old_dl",
                       F.lit(1).alias("chg"))
        .unionByName(deleted.select(F.col("old_doc_id").alias("doc_id"),
                                    "old_dl", F.lit(0).alias("chg")))
    )
    obs_rem = Observation("removed_stats")
    import threading

    _side_err: list[BaseException] = []

    def _write_tombstones() -> None:
        try:
            tomb_src.observe(
                obs_rem, F.count(F.lit(1)).alias("n"),
                F.sum("old_dl").alias("s"), F.sum("chg").alias("nc")
            ).select("doc_id").write.mode("overwrite").parquet(
                _tombstones_path(index_dir, gen))
        except BaseException as e:  # surfaced after join()
            _side_err.append(e)

    ts_thread = threading.Thread(target=_write_tombstones, daemon=True)
    ts_thread.start()
    obs = Observation("delta_stats")
    try:
        delta_plan.observe(
            obs, F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s"),
            F.max("doc_id").alias("m")).write.mode("overwrite").option(
            "compression", "snappy").parquet(_staging)
    finally:
        ts_thread.join()
    if _side_err:
        raise _side_err[0]
    n_delta, dl_delta = int(obs.get["n"]), int(obs.get["s"] or 0)
    # advance the chain's next_doc_id watermark: a delete-only or
    # changed-only delta allocates nothing, so the watermark never moves
    # backwards
    obs_max = obs.get["m"]
    next_doc_id = max(int(start_id),
                      int(obs_max) + 1 if obs_max is not None else 0)
    delta_docs = spark.read.parquet(_staging)
    n_removed, dl_removed = int(obs_rem.get["n"]), int(obs_rem.get["s"] or 0)
    n_changed = int(obs_rem.get["nc"] or 0)
    prev_m = chain[-1]
    n_live = prev_m["n_docs_live"] + n_delta - n_removed + 0  # changed counted in both
    # changed docs: removed old (in rem) and re-added (in delta) -> net N includes once
    sum_dl_live = prev_m["sum_dl_live"] + dl_delta - dl_removed

    def _write_docmap() -> None:
        try:
            delta_docs.select("url", "doc_id", "dl", "text_hash").write.mode(
                "overwrite").parquet(_docmap_path(index_dir, gen))
        except BaseException as e:
            _side_err.append(e)

    dm_thread = threading.Thread(target=_write_docmap, daemon=True)
    dm_thread.start()
    try:
        # raw token instances; the segment writer aggregates tf (round 7 —
        # same single-shuffle shape as the full build)
        raw = delta_docs.select("doc_id", "dl", F.explode("tokens").alias("term"))
        part_metrics = build_segments(raw, cfg, index_dir, gen, resume=resume)
    finally:
        # join even on error: a same-gen retry must never overlap a stale
        # in-flight write of the same docmap path
        dm_thread.join()
    if _side_err:
        raise _side_err[0]
    import shutil

    shutil.rmtree(_staging, ignore_errors=True)
    wall = time.monotonic() - t0
    m = mf.write_manifest(
        index_dir, gen, parent=parent, n_docs_live=n_live, sum_dl_live=sum_dl_live,
        metrics={
            "kind": "incremental", "wall_sec": wall,
            "docs_added": n_delta - n_changed, "docs_changed": n_changed,
            "docs_deleted": n_removed - n_changed,
            "docs_per_sec": (n_delta / wall) if wall else 0.0,
            "partitions": part_metrics,
        },
        lineage=lineage or {},
        extra={"has_tombstones": True, "config": layout_record(cfg),
               "next_doc_id": next_doc_id},
    )
    if publish:
        mf.publish(index_dir, gen)
    return m


def live_docmap(spark: SparkSession, index_dir: str, gens: list[int]) -> DataFrame:
    """(url, doc_id, dl, text_hash) of LIVE docs across the gen chain —
    newest gen wins per url, tombstoned-without-replacement urls dropped."""
    from pyspark.sql import Window

    parts = []
    for g in gens:
        parts.append(
            spark.read.parquet(_docmap_path(index_dir, g)).withColumn("gen", F.lit(g))
        )
    all_docs = parts[0]
    for p in parts[1:]:
        all_docs = all_docs.unionByName(p)
    w = Window.partitionBy("url").orderBy(F.col("gen").desc())
    latest = (
        all_docs.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
    # drop urls whose doc_id is tombstoned at a gen >= their own gen and not re-added
    tombs = read_tombstones(spark, index_dir, gens)
    if tombs is not None:
        dead = tombs.groupBy("doc_id").agg(F.max("tomb_gen").alias("tomb_gen"))
        # a changed doc is tombstoned AND re-added in the same gen, so
        # liveness = docmap row at gen >= the newest tombstone for the id
        latest = latest.join(dead, "doc_id", "left").filter(
            F.col("tomb_gen").isNull() | (F.col("gen") >= F.col("tomb_gen"))
        ).drop("tomb_gen")
    return latest.drop("gen")


def read_tombstones(spark: SparkSession, index_dir: str, gens: list[int]) -> DataFrame | None:
    parts = []
    for g in gens:
        p = _tombstones_path(index_dir, g)
        if os.path.isdir(p):
            parts.append(spark.read.parquet(p).withColumn("tomb_gen", F.lit(g)))
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
