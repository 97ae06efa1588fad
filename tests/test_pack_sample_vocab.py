"""Unit semantics for the round-5 training-mix operators: deterministic
stratified sampling, concat-and-chunk sequence packing, per-group vocab
top-k, and duplicate-shingle coverage. The value-level oracle parity for
each lives in test_oracle_parity.py; these pin the semantic properties
the oracle comparison alone would not surface (re-run stability,
keep-set monotonicity, chunk-boundary invariants, tie-breaks) plus the
plan shapes the 100-TB design depends on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mee_spark.dedup import dup_shingle_coverage
from mee_spark.textops import (KNUTH_HASH, pack_sequences,
                               sample_hash_stratified, vocab_topk)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")


def _corpus(spark, n=200):
    rows = [(i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(5 + i % 9)),
             ["en", "de", "zh", "fr"][i % 4], f"src{i % 5}", 40 + i % 9)
            for i in range(n)]
    return _docs(spark, rows)


# ------------------------------------------------------------- sampling

def test_sample_is_deterministic_and_monotone(spark):
    docs = _corpus(spark)
    rates = {"en": 0.8, "de": 0.4}
    a = {r["doc_id"] for r in
         sample_hash_stratified(docs, rates, default_rate=0.2).collect()}
    b = {r["doc_id"] for r in
         sample_hash_stratified(docs, rates, default_rate=0.2).collect()}
    assert a == b and a  # re-run reproduces the exact keep-set
    # keep decisions depend only on (doc_id, lang): sampling a SUBSET of
    # the corpus keeps exactly the intersection — growing the corpus can
    # never flip an existing doc's decision (stable incremental mixes)
    sub = docs.filter(F.col("doc_id") % 2 == 0)
    got = {r["doc_id"] for r in
           sample_hash_stratified(sub, rates, default_rate=0.2).collect()}
    assert got == {d for d in a if d % 2 == 0}


def test_sample_rate_zero_and_one(spark):
    docs = _corpus(spark)
    out = sample_hash_stratified(docs, {"en": 1.0}, default_rate=0.0)
    langs = {r["lang"] for r in out.collect()}
    assert langs == {"en"}  # rate-0 strata vanish entirely
    n_en = docs.filter(F.col("lang") == "en").count()
    assert out.count() == n_en  # rate-1.0 keeps every doc of the stratum


def test_sample_rates_track_expectation(spark):
    docs = _corpus(spark, n=2000)
    out = sample_hash_stratified(docs, {"en": 0.5}, default_rate=0.1)
    n_en_all = docs.filter(F.col("lang") == "en").count()
    n_en_kept = out.filter(F.col("lang") == "en").count()
    # Knuth hash is uniform: 500 en docs at rate .5 -> ~250; wide band
    assert 0.35 * n_en_all < n_en_kept < 0.65 * n_en_all


def test_sample_plan_prunes_text(spark):
    """The sampler never needs the text column: its scan must not read
    it (at 100 TB text is ~99% of the bytes; reading it would turn a
    metadata-rate filter into a full-corpus scan)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (sample_hash_stratified(docs, {"en": 0.5})
            ._jdf.queryExecution().executedPlan().toString())
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema


# -------------------------------------------------------------- packing

def test_pack_sequences_chunk_invariants(spark):
    docs = _corpus(spark)
    out = pack_sequences(docs, budget=32, n_buckets=4).collect()
    assert len(out) == docs.count()
    by_bucket: dict[int, list] = {}
    for r in out:
        assert 0 <= r["seq_offset"] < 32  # a doc STARTS inside its chunk
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(by_bucket) == {0, 1, 2, 3}
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r["doc_id"])
        # first doc of each shard opens chunk 0 at offset 0
        assert rows[0]["seq"] == 0 and rows[0]["seq_offset"] == 0
        cum = 0
        for r in rows:
            # seq/offset are exactly the stream-chunking of the cumsum:
            # deterministic, order-stable, no hidden packing state
            assert r["seq"] == cum // 32
            assert r["seq_offset"] == cum % 32
            cum += r["n_tokens"]
        # chunk ids are dense enough to address: max seq bounded by the
        # token stream length
        assert rows[-1]["seq"] <= cum // 32


def test_pack_sequences_single_shuffle(spark):
    """One hashpartitioning exchange (the bucket shuffle feeding the
    window sort) — packing must not re-shuffle per window step."""
    docs = _corpus(spark)
    plan = (pack_sequences(docs, budget=64, n_buckets=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1


def test_pack_bucket_is_knuth_hash(spark):
    docs = _corpus(spark, n=50)
    for r in pack_sequences(docs, budget=16, n_buckets=8).collect():
        u = (r["doc_id"] * KNUTH_HASH) % (1 << 32)
        assert r["bucket"] == (u * 8) >> 32  # HIGH bits, not u % 8


def test_knuth_u32_no_int64_overflow(spark):
    """The split-multiply form must equal ((id mod 2^32) * K) mod 2^32
    for ids ABOVE the naive int64 overflow point (~3.46e9): a 10^12-doc
    corpus has doc_ids past 2^40, where naive id*K wraps silently in
    Spark and raises in ANSI engines (ADVICE r5)."""
    from mee_spark.textops import _knuth_u32

    ids = [0, 1, 499, 65536, 2**31, 2**32 - 1, 2**32 + 7,
           2**40 + 123, 2**62]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: r["u"] for r in
           df.select("doc_id", _knuth_u32(F.col("doc_id")).alias("u")).collect()}
    for i in ids:
        assert got[i] == ((i % (1 << 32)) * KNUTH_HASH) % (1 << 32), i


# ---------------------------------------------------------------- vocab

def test_vocab_topk_rank_and_tiebreak(spark):
    rows = [(1, "b b a a c", "en", "s", 9), (2, "a b d", "en", "s", 5),
            (3, "x y", "de", "s", 3)]
    out = vocab_topk(_docs(spark, rows), k=3)
    en = sorted((r["rank"], r["token"], r["cnt"])
                for r in out.filter(F.col("lang") == "en").collect())
    # a and b tie at 3 -> token text breaks the tie deterministically
    assert en == [(1, "a", 3), (2, "b", 3), (3, "c", 1)]
    de = {(r["rank"], r["token"]) for r in
          out.filter(F.col("lang") == "de").collect()}
    assert de == {(1, "x"), (2, "y")}


def test_vocab_topk_partial_aggregation(spark):
    """The count must partial-aggregate map-side (combiners absorb hot
    tokens before the shuffle): two HashAggregates around one exchange."""
    plan = (vocab_topk(_corpus(spark), k=5)
            ._jdf.queryExecution().executedPlan().toString())
    agg_exchange = plan.split("Window")[-1]  # below the window: the agg
    assert "Exchange hashpartitioning" in agg_exchange
    assert agg_exchange.count("HashAggregate") >= 2


# ------------------------------------------------------------- coverage

def test_dup_coverage_extremes(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon", "en", "s", 30),
        (2, "alpha beta gamma delta epsilon", "en", "s", 30),  # exact dup
        (3, "zeta eta theta iota kappa", "en", "s", 25),       # unique
        (4, "alpha beta gamma nu xi omicron", "en", "s", 30),  # partial
    ]
    got = {r["doc_id"]: r for r in
           dup_shingle_coverage(_docs(spark, rows), n=3).collect()}
    assert got[1]["dup_ppm"] == 1000000 and got[2]["dup_ppm"] == 1000000
    assert got[3]["dup_ppm"] == 0
    assert 0 < got[4]["dup_ppm"] < 1000000  # shares only the prefix grams
    for r in got.values():
        assert 0 <= r["dup_shingles"] <= r["n_shingles"]
