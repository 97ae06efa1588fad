"""Tokenizer contract: JVM expression ≡ pandas UDF ≡ pure Python."""

from __future__ import annotations

from pyspark.sql import functions as F

from mee_spark.textprep import py_tokenize, tokenize_col, tokenize_udf

CASES = [
    "Hello, World!  multiple   spaces",
    "unicode café stays ascii-split",
    "UPPER lower 123abc a1b2",
    "",
    "   ",
    "a-b_c.d,e;f",
    "trailing space ",
    "w000001 w000001 w000002",
]


def test_py_tokenize_basic():
    assert py_tokenize("Hello, World!") == ["hello", "world"]
    assert py_tokenize("") == []
    assert py_tokenize("a1 B2-c3") == ["a1", "b2", "c3"]


def test_jvm_matches_python(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "s string")
    got = [r["toks"] for r in
           df.select(tokenize_col(F.col("s")).alias("toks")).collect()]
    want = [py_tokenize(s) for s in CASES]
    assert got == want


def test_udf_matches_python(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "s string")
    got = [r["toks"] for r in df.select(tokenize_udf("s").alias("toks")).collect()]
    want = [py_tokenize(s) for s in CASES]
    assert got == want


def test_assign_doc_ids_dedups_duplicate_urls(spark):
    """The range shuffle colocates equal urls and the sorted rank pass
    dedups them adjacent-wise — same result as a distinct() exchange,
    one fewer full shuffle (round-3 Amdahl fix)."""
    from mee_spark.docmap import assign_doc_ids

    urls = [f"https://ex.com/{i:04d}" for i in range(500)]
    rows = [(u,) for u in urls] + [(u,) for u in urls[::7]]  # dups
    pages = spark.createDataFrame(rows, "url string").repartition(13)
    got = {r["url"]: r["doc_id"] for r in assign_doc_ids(pages, 8).collect()}
    want = {u: i for i, u in enumerate(sorted(urls))}
    assert got == want
