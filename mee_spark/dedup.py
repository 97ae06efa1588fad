"""Deduplication operators for web-scale training-data pipelines.

Five dedup families, each expressed as a declarative DataFrame plan so
Catalyst handles pushdown/pruning, and each designed to survive 100 TB:

* exact        — hash-groupBy on the canonical fingerprint. One shuffle
                 keyed by a 60-bit hash: uniform, skew-free.
* minhash LSH  — shingle → minhash signature → band buckets → candidate
                 pairs ONLY within buckets (never all-pairs), then exact
                 Jaccard verify on candidates. The classic near-dup path
                 for 10^12 docs; all-pairs never materializes.
* simhash      — 64-bit weighted-bit fingerprint; near-dups = small
                 hamming distance; bucketed by rotation prefix at scale.
* n-gram Jaccard — token-shingle overlap join; the verify primitive.
* embedding cosine — see similarity.py (shared kernel).

Every hash is the md5-based ``hash15`` shared with the DuckDB oracle, so
signatures/buckets/pairs are bit-identical across engines and testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mee_spark.textops import hash15
from mee_spark.textprep import tokenize_col


def spread(df: DataFrame) -> DataFrame:
    """Widen narrow scans before hash-heavy per-doc expansion.

    A small single-file input scans as ONE task, serializing millions of
    md5/fold calls that happen before the first shuffle. At corpus scale
    inputs scan wide naturally (many files), so the repartition is gated
    on the actual scan width — the big-data path stays shuffle-free."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def dedup_exact(docs: DataFrame) -> DataFrame:
    """(doc_id, n_dupes): one survivor (min doc_id) per canonical text.

    groupBy on the fingerprint hash — a single uniform shuffle; at
    100 TB this is the cheapest possible dedup (no pairwise anything).
    """
    norm = F.array_join(tokenize_col(F.col("text")), " ")
    return (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), hash15(norm).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").cast("long").alias("n_dupes"))
        .select("doc_id", "n_dupes")
    )


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct token n-grams, hashed to int64.

    Built from JVM expressions: transform over token index windows, then
    explode. No Python. distinct per doc (Jaccard is set-based)."""
    toks = tokenize_col(F.col("text"))
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
    )
    return (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.explode(F.array_distinct(grams)).alias("gram"))
        .filter(F.length("gram") > 0)
        .select("doc_id", hash15(F.col("gram")).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                        max_shingle_df: int | None = None) -> DataFrame:
    """(doc_id_a, doc_id_b, jaccard) for pairs with shingle-set Jaccard
    >= threshold, a < b.

    The shingle equi-join only pairs docs SHARING a shingle — at scale
    this is the blocking step (plus minhash banding upstream, below);
    the join key is a uniform hash so the shuffle is skew-resistant
    ACROSS shingles, but a single boilerplate shingle shared by M docs
    is still one M²-pair group. ``max_shingle_df`` drops shingles with
    doc frequency above the cap from the UNIVERSE (sizes and join alike,
    so the Jaccard stays internally consistent over the filtered sets) —
    the standard stopword-shingle treatment. None = exact kernel for
    verify/oracle duty, where the candidate set is already blocked.
    """
    sh = shingles(spread(docs), n)
    if max_shingle_df is not None:
        hot = (sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
               .filter(F.col("_df") > max_shingle_df).select("shingle"))
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .agg(F.count("*").cast("long").alias("common"))
    )
    return (
        common
        .join(sizes.withColumnsRenamed({"doc_id": "doc_id_a", "sz": "sz_a"}), "doc_id_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_id_b", "sz": "sz_b"}), "doc_id_b")
        .withColumn("jaccard", F.round(
            F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )


def minhash_signatures(docs: DataFrame, num_hashes: int = 16, n: int = 3) -> DataFrame:
    """(doc_id, sig: array<long>) — minhash signature over shingles.

    h_i(s) = hash15(i || ':' || shingle-gram); min per (doc, i). The
    per-(doc, i) min is a hash aggregate with map-side partial min —
    no skew (keys are doc-uniform)."""
    toks = tokenize_col(F.col("text"))
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    )
    g = (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.explode(grams).alias("gram"))
        .filter(F.length("gram") > 0)
    )
    hashed = g.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_hashes - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("i"),
                    hash15(F.concat(i.cast("string"), F.lit(":"), F.col("gram"))).alias("h"),
                ),
            )
        ).alias("ih"),
    ).select("doc_id", F.col("ih.i").alias("i"), F.col("ih.h").alias("h"))
    mins = hashed.groupBy("doc_id", "i").agg(F.min("h").alias("minv"))
    return (
        mins.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("i", "minv"))).alias("s"))
        .select("doc_id", F.transform("s", lambda x: x["minv"]).alias("sig"))
    )


def minhash_lsh_pairs(
    docs: DataFrame, num_hashes: int = 16, bands: int = 4, n: int = 3,
    verify_threshold: float = 0.5, broadcast_limit: int = 2_000_000,
) -> DataFrame:
    """(doc_id_a, doc_id_b, jaccard): banded-LSH candidates verified by
    exact shingle Jaccard. rows-per-band = num_hashes//bands.

    Scale shape: candidates come from groupBy(band_key) — only docs
    agreeing on a full band ever meet; verification joins are between
    candidate pairs only. This is the 10^12-doc near-dup pipeline; the
    all-pairs Jaccard above is its verify kernel and small-scale oracle.
    """
    rows = num_hashes // bands
    docs = spread(docs)
    sigs = minhash_signatures(docs, num_hashes, n)
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.struct(
                    bi.cast("int").alias("band"),
                    F.md5(F.array_join(
                        F.transform(F.slice(F.col("sig"), bi * rows + 1, rows),
                                    lambda v: v.cast("string")), ",")).alias("key"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    # materialize the band keys ONCE before the self-join: both branches
    # would otherwise inline the whole signature pipeline (shingle explode
    # → num_hashes-way min fold → md5 band keys), computing it twice and
    # doubling the Catalyst tree. (doc_id, band, key) is docs x bands rows
    # — small relative to the corpus, the right thing to pin at any scale.
    banded = banded.localCheckpoint(eager=True)
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .distinct()
    )
    # verify CANDIDATES ONLY (the whole point of LSH): restrict the shingle
    # join to candidate pairs instead of computing all-pairs Jaccard. The
    # candidate set is materialized once (localCheckpoint: distributed, no
    # driver data) and the broadcast hint is GATED ON ITS MEASURED COUNT —
    # usually tiny, so the two verify joins go broadcast-hash with zero
    # shingle shuffles; past the gate (10^12-doc near-dup density) it
    # degrades to a shuffle join instead of dying at the broadcast ceiling.
    candidates = candidates.localCheckpoint(eager=True)
    sh = shingles(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("sz"))
    cand_b = (F.broadcast(candidates) if candidates.count() <= broadcast_limit
              else candidates)
    common = (
        cand_b
        .join(sh.withColumnRenamed("doc_id", "doc_id_a"), "doc_id_a")
        # two-key equi-join: only shingles present in BOTH docs survive,
        # i.e. |sh(a) ∩ sh(b)| rows per candidate pair
        .join(sh.select(F.col("doc_id").alias("doc_id_b"), "shingle"),
              ["doc_id_b", "shingle"])
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").cast("long").alias("common"))
    )
    return (
        common
        .join(sizes.withColumnsRenamed({"doc_id": "doc_id_a", "sz": "sz_a"}), "doc_id_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_id_b", "sz": "sz_b"}), "doc_id_b")
        .withColumn("jaccard", F.round(
            F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"), 6))
        .filter(F.col("jaccard") >= verify_threshold)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )


def simhash(docs: DataFrame, bits: int = 64) -> DataFrame:
    """(doc_id, simhash) — weighted-bit fingerprint: per bit j, sum +1/-1
    over tokens (weight = tf via multiplicity); bit set iff sum > 0.

    Plan: explode tokens → hash once per token → explode bit index →
    conditional sum → bit-OR aggregate. All JVM-side; the groupBy keys
    (doc_id, j) are uniform."""
    toks = tokenize_col(F.col("text"))
    t = spread(docs).select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.explode(toks).alias("tok"))
    h = t.select("doc_id", hash15(F.col("tok")).alias("h"))
    bitsdf = h.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
        F.col("h"),
    ).select(
        "doc_id", "j",
        # shiftright() builtin takes a literal shift; column shifts via SQL fn
        F.when(F.expr("shiftright(h, j)").bitwiseAND(1) == 1, F.lit(1))
        .otherwise(F.lit(-1)).alias("v"),
    )
    per_bit = bitsdf.groupBy("doc_id", "j").agg(F.sum("v").alias("s"))
    return (
        per_bit.withColumn(
            "bitval",
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)"))
            .otherwise(F.lit(0).cast("long")))
        .groupBy("doc_id")
        .agg(F.sum("bitval").cast("long").alias("simhash"))
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(doc_id_a, doc_id_b, hamming) — near-dup pairs by simhash distance.

    Small-scale: all-pairs on the 1-row-per-doc simhash table (tiny).
    At 10^12 docs: band the 64 bits into (max_hamming+1) chunks — any
    pair within distance max_hamming agrees on >=1 chunk (pigeonhole) —
    and join per chunk; that variant is ``simhash_pairs_banded``."""
    s = simhash(docs)
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs_banded(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Scale path: pigeonhole banding — identical output to simhash_pairs."""
    chunks = max_hamming + 1
    width = 64 // chunks
    s = simhash(docs)
    banded = s.select(
        "doc_id", "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(chunks - 1))).alias("c"),
    ).withColumn(
        "ckey",
        F.expr(f"shiftright(simhash, CAST(c * {width} AS INT))")
        .bitwiseAND((1 << width) - 1),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.ckey") == F.col("b.ckey"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"),
                F.col("a.simhash").alias("sa"), F.col("b.simhash").alias("sb"))
        .distinct()
    )
    return cand.select(
        "doc_id_a", "doc_id_b",
        F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("long").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def dup_connected_components(pairs: DataFrame, a_col: str = "doc_id_a",
                             b_col: str = "doc_id_b",
                             max_iter: int = 20) -> DataFrame:
    """(doc_id, cluster_id) — connected components over near-dup PAIRS:
    the step every production dedup pipeline needs after pair generation
    (minhash/simhash/winnow emit edges; retention decisions need whole
    clusters, or transitive duplicates survive: a~b, b~c keeps both a
    and c if you only drop pairwise). cluster_id = min doc_id in the
    component, so "keep the cluster representative" is a filter.

    Spark-first iterative min-label propagation with POINTER JUMPING:
    each round takes the min label over graph neighbors, then follows
    label→label-of-label, giving O(log diameter) rounds (the alternating
    large-star/small-star idea from the MapReduce CC literature). A
    driver loop is the honest shape for an iterative fixpoint — each
    iteration is a fully distributed pair of shuffles, and the loop
    carries only a scalar changed-count. Per-iteration localCheckpoint
    truncates lineage (iterative self-joins otherwise grow the plan
    exponentially) and bounds recomputation.

    100-TB shape: edges shuffle on node id (uniform); the neighbor-min
    groupBy partial-aggregates map-side, so hub docs (one doc paired
    with thousands of boilerplate near-dups) are absorbed by combiners
    rather than skewing a reducer. Dup components in web corpora have
    tiny diameters, so rounds ≈ 3-5 in practice; ``max_iter`` bounds the
    adversarial chain case and convergence is detected exactly (changed
    count == 0), never assumed."""
    edges = (pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
             .union(pairs.select(F.col(b_col).alias("src"),
                                 F.col(a_col).alias("dst")))
             .distinct().localCheckpoint())
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node")).localCheckpoint())
    for _ in range(max_iter):
        nbr_min = (edges.join(labels, edges["dst"] == labels["node"])
                   .groupBy("src").agg(F.min("label").alias("nbr_label")))
        stepped = (labels.join(nbr_min, labels["node"] == nbr_min["src"],
                               "left")
                   .select(labels["node"],
                           F.least(labels["label"],
                                   F.coalesce(nbr_min["nbr_label"],
                                              labels["label"]))
                           .alias("label")))
        # pointer jump: label <- label(label); components collapse toward
        # their minimum in logarithmic rounds instead of linear
        lab2 = stepped.select(F.col("node").alias("n2"),
                              F.col("label").alias("l2"))
        jumped = (stepped.join(lab2, stepped["label"] == lab2["n2"], "left")
                  .select(stepped["node"],
                          F.least(stepped["label"],
                                  F.coalesce(lab2["l2"], stepped["label"]))
                          .alias("label"))
                  .localCheckpoint())
        changed = (jumped.alias("j")
                   .join(labels.alias("o"), F.col("j.node") == F.col("o.node"))
                   .filter(F.col("j.label") != F.col("o.label")).count())
        labels = jumped
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("cluster_id"))


def dup_shingle_coverage(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, n_shingles, dup_shingles, dup_ppm) — duplicate-text
    coverage: for each doc, the count and ppm share of its distinct
    token n-grams that also occur in at least one OTHER document. The
    excess-duplication retention signal (drop or down-sample docs whose
    text is mostly duplicated elsewhere) that complements the pairwise
    dedup family: it needs no pair enumeration at all, so it stays
    linear where even banded pair-joins grow with dup density.

    Scale shape: explode -> one uniform-hash groupBy for per-shingle
    doc frequency -> equi-join back on the same 60-bit key -> per-doc
    agg. A boilerplate shingle shared by M docs contributes M join rows
    (not M^2 pairs), so hot shingles cost linear fan-out only; both
    shuffles key on uniform hashes. Docs whose tokenized text is empty
    produce no shingles and drop out (mirrored by the oracle)."""
    sh = shingles(spread(docs), n)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shingles"),
             F.sum(F.when(F.col("df") > 1, 1).otherwise(0)).cast("long")
             .alias("dup_shingles"))
        .withColumn("dup_ppm",
                    F.floor(F.col("dup_shingles") * 1000000
                            / F.col("n_shingles")).cast("long"))
        .select("doc_id", "n_shingles", "dup_shingles", "dup_ppm")
    )


def decontaminate(docs: DataFrame, probes: DataFrame, n: int = 8,
                  min_shared: int = 1) -> DataFrame:
    """Benchmark decontamination: which training docs share verbatim
    n-grams with an evaluation set?

    ``docs`` is the training corpus (doc_id, text); ``probes`` the eval
    set (probe_id, text). Returns (probe_id, doc_id, shared_ngrams,
    probe_ngrams, frac) for pairs sharing ≥ ``min_shared`` distinct
    token n-grams, where ``frac`` is the contaminated share of the
    probe's n-grams — the filter signal for dropping tainted training
    docs (or flagging tainted eval items).

    Scale shape: eval sets are small (thousands of items) while the
    corpus is the 10^12-doc side, so the probe shingle set broadcasts
    and the corpus shingle stream is filtered map-side — the only
    shuffle is the per-(probe, doc) overlap count, whose input is just
    the matched grams. With n=8 a cross-doc collision is essentially
    always a real verbatim overlap, so no verify pass is needed
    (contrast ``ngram_jaccard_pairs`` at n=3).
    """
    d_sh = shingles(docs, n)
    p_sh = shingles(
        probes.select(F.col("probe_id").alias("doc_id"), "text"), n
    ).select(F.col("doc_id").alias("probe_id"), "shingle")
    p_sz = p_sh.groupBy("probe_id").agg(
        F.count("*").cast("long").alias("probe_ngrams"))
    shared = (
        d_sh.join(F.broadcast(p_sh), "shingle")
        .groupBy("probe_id", "doc_id")
        .agg(F.count("*").cast("long").alias("shared_ngrams"))
    )
    return (
        shared.join(F.broadcast(p_sz), "probe_id")
        .where(F.col("shared_ngrams") >= min_shared)
        .select("probe_id", "doc_id", "shared_ngrams", "probe_ngrams",
                F.round(F.col("shared_ngrams")
                        / F.col("probe_ngrams").cast("double"), 6).alias("frac"))
    )
