"""Property tests for the round-2 text operators: winnowing guarantee,
BPE-ish counting arithmetic, curation-pipeline composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from mee_spark.textops import bpe_token_stats, winnow_fingerprints


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing theorem: two docs sharing a substring of length >=
    k + window - 1 (here 11 chars) share at least one fingerprint."""
    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [(1, f"unique one {shared} tail tail"),
         (2, f"other prefix words {shared}"),
         (3, "entirely disjoint content nothing common here")],
        "doc_id long, text string")
    fps = winnow_fingerprints(docs, k=8, window=4)
    by_doc = {r["doc_id"]: set() for r in fps.select("doc_id").distinct().collect()}
    for r in fps.collect():
        by_doc[r["doc_id"]].add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared substring must yield a shared fingerprint"
    # density: winnowing selects far fewer fingerprints than gram count
    n_grams_doc3 = len("entirely disjoint content nothing common here") - 8 + 1
    assert len(by_doc[3]) < n_grams_doc3


def test_winnowing_determinism_and_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "tiny"), (2, ""), (3, "exactly8")], "doc_id long, text string")
    a = sorted(map(tuple, winnow_fingerprints(docs, k=8, window=4).collect()))
    b = sorted(map(tuple, winnow_fingerprints(docs, k=8, window=4).collect()))
    assert a == b
    # every doc (even shorter than k) gets >= 1 fingerprint
    assert {t[0] for t in a} == {1, 2, 3}


def test_bpe_counting_arithmetic(spark):
    docs = spark.createDataFrame(
        [(1, "hello world42 !!"),      # hello(2) world(2*)... see below
         (2, ""),
         (3, "abcdefgh")],             # one 8-char run -> 2 subwords
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in bpe_token_stats(docs).collect()}
    # doc 1 units: 'hello'(5->2), 'world'(5->2), '42'(2->1), '!!'(2->1)
    assert rows[1]["n_units"] == 4 and rows[1]["n_subwords"] == 6
    assert rows[2]["n_units"] == 0 and rows[2]["n_subwords"] == 0
    assert rows[3]["n_units"] == 1 and rows[3]["n_subwords"] == 2


def test_curation_pipeline_is_conjunction(spark):
    """Survivors of the composed pipeline are exactly the intersection of
    the three upstream operator predicates."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    out = {r["doc_id"] for r in em.q_pipeline_curate(spark, sf).collect()}
    docs = em._read(spark, sf, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    from mee_spark.dedup import dedup_exact
    from mee_spark.textops import langid, quality_scores

    surv = {r["doc_id"] for r in dedup_exact(docs).collect()}
    en = {r["doc_id"] for r in langid(docs).collect() if r["lang_pred"] == "en"}
    good = {r["doc_id"] for r in quality_scores(docs).collect()
            if r["quality_ppm"] >= 450_000}
    assert out == (surv & en & good)
    assert out  # non-trivial at this SF


def test_repetition_stats_semantics(spark):
    """Gopher/C4 repetition signals pinned on crafted docs: 'a b a b a b'
    -> 6 tokens, 2 distinct (dup 666666 ppm); bigrams ab,ba,ab,ba,ab ->
    top 3 of 5 (600000 ppm). A 1-token doc has zero bigram mass and must
    survive the left join with ppm 0."""
    from mee_spark.textops import repetition_stats

    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "solo"), (3, "x, y; x y x")],
        "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert got[1] == {"doc_id": 1, "n_tokens": 6, "dup_token_ppm": 666666,
                      "top_bigram_ppm": 600000}
    assert got[2] == {"doc_id": 2, "n_tokens": 1, "dup_token_ppm": 0,
                      "top_bigram_ppm": 0}
    assert got[3] == {"doc_id": 3, "n_tokens": 5, "dup_token_ppm": 600000,
                      "top_bigram_ppm": 500000}


def test_pii_stats_counts_each_kind(spark):
    from mee_spark.textops import pii_stats

    docs = spark.createDataFrame(
        [(1, "reach me at jo.doe+spam@mail.example.org or 10.0.0.7"),
         (2, "call +44-123-456-7890 twice: +1-555-000-1234"),
         (3, "clean text no identifiers here")],
        "doc_id long, text string")
    out = {r.doc_id: (r.n_emails, r.n_ipv4, r.n_phones, r.has_pii)
           for r in pii_stats(docs).collect()}
    assert out == {1: (1, 1, 0, True), 2: (0, 0, 2, True),
                   3: (0, 0, 0, False)}


def test_pii_redact_masks_whole_spans(spark):
    from mee_spark.textops import pii_redact

    docs = spark.createDataFrame(
        [(1, "mail a.b@c.org ip 1.2.3.4 tel +1-555-123-4567 end")],
        "doc_id long, text string")
    [row] = pii_redact(docs).collect()
    assert row.text_redacted == "mail <EMAIL> ip <IP> tel <PHONE> end"
