"""Similarity search over embedding columns (`embeddings` table:
vec_id bigint, embedding array<float>, label int).

* ``cosine_col`` — double-precision cosine as a JVM expression
  (zip_with + aggregate): stays in codegen, matches the DuckDB oracle's
  list-lambda formulation exactly (both accumulate left-to-right in
  float64).
* ``ann_bruteforce_topk`` — exact top-k: broadcast the (tiny) probe set
  against the corpus; shuffle only (probe × corpus-partition) local
  top-k candidates. The correctness baseline.
* ``ann_lsh_topk`` — the scale path: random-hyperplane LSH (deterministic
  hyperplanes from a seeded RNG, broadcast), candidates restricted to
  matching buckets (+ optional multi-probe), exact cosine re-rank within
  the bucket. Recall vs brute force is a tested property, not a hope.
* ``embedding_dup_pairs`` — near-dup by cosine >= threshold, LSH-blocked.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine_col(a: Column, b: Column) -> Column:
    """Double-precision cosine similarity of two array<float> columns."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (na * nb)


def ann_bruteforce_topk(emb: DataFrame, probe_ids: list[int], k: int = 10) -> DataFrame:
    """(probe_id, rank, vec_id, cos) exact top-k neighbors per probe.

    Probes broadcast (never shuffle the corpus); self-match excluded;
    ties (cos desc, vec_id asc), cosine rounded 1e-6 for determinism."""
    probes = emb.filter(F.col("vec_id").isin([int(p) for p in probe_ids])).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pvec"))
    scored = (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id", "vec_id",
            F.round(cosine_col(F.col("pvec"), F.col("embedding")), 6).alias("cos"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(F.col("probe_id").cast("long"), "rank", F.col("vec_id").cast("long"), "cos")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 13) -> np.ndarray:
    """Deterministic random hyperplanes (float64, seeded)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_col(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id from the hyperplane projections (JVM arithmetic)."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(c)) for c in plane]),
                       lambda x, c: x.cast("double") * c),
            F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(proj > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(emb: DataFrame, probe_ids: list[int], k: int = 10,
                 n_planes: int = 8, seed: int = 13, dim: int = 64,
                 multi_probe: bool = True) -> DataFrame:
    """LSH-bucketed ANN: candidates share the probe's bucket; exact cosine
    re-rank inside. At 10^12 vectors the bucket groupBy replaces the
    cross join — cost drops from O(N·P) to O(N/2^planes · P) per probe.

    ``multi_probe`` additionally probes every bucket at hamming distance
    1 from the probe's own (flip each plane's sign bit): near neighbors
    that straddle one hyperplane are recovered at (planes+1)x candidate
    cost — the standard recall lever without more tables."""
    planes = hyperplanes(dim, n_planes, seed)
    bucketed = emb.withColumn("bkt", lsh_bucket_col(F.col("embedding"), planes))
    probes = bucketed.filter(F.col("vec_id").isin([int(p) for p in probe_ids])).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pvec"),
        F.col("bkt").alias("pbkt"))
    if multi_probe:
        flips = F.array(F.lit(0), *[F.lit(1 << j) for j in range(n_planes)])
        probes = probes.withColumn(
            "pbkt", F.explode(F.transform(flips, lambda m: F.col("pbkt").bitwiseXOR(m))))
    scored = (
        bucketed.join(F.broadcast(probes), F.col("bkt") == F.col("pbkt"))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id",
                F.round(cosine_col(F.col("pvec"), F.col("embedding")), 6).alias("cos"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(F.col("probe_id").cast("long"), "rank", F.col("vec_id").cast("long"), "cos")
    )


def embedding_dup_pairs(emb: DataFrame, threshold: float = 0.98) -> DataFrame:
    """(vec_id_a, vec_id_b, cos) — embedding-cosine near-duplicates.

    Small-scale exact form: all pairs a<b (the oracle-comparable one).
    The LSH-blocked variant reuses ann_lsh_topk's bucketing upstream."""
    a = emb.select(F.col("vec_id").alias("vec_id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_id_b"), F.col("embedding").alias("vb"))
    return (
        a.join(b, F.col("vec_id_a") < F.col("vec_id_b"))
        .select("vec_id_a", "vec_id_b",
                F.round(cosine_col(F.col("va"), F.col("vb")), 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
