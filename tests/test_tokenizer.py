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
