"""Tokenizer determinism + synthetic corpus invariants (SURVEY.md §5 item 1)."""

import hashlib

from pyspark.sql import functions as F

from elasticsearch_batch_percolator_spark.corpus import (
    synth_corpus,
    with_doc_ids,
    with_sha256,
)
from elasticsearch_batch_percolator_spark.functions.tokenizer import (
    tokenize_code,
    tokenize_ws,
)


def test_tokenize_ws_matches_python(spark):
    rows = [("a b  c",), ("The Fox IS here",), ("",), ("x",)]
    df = spark.createDataFrame(rows, "content string")
    got = [r[0] for r in df.select(tokenize_ws("content")).collect()]
    exp = [[t for t in c.lower().split(" ") if t] for (c,) in rows]
    assert got == exp


def test_tokenize_code(spark):
    df = spark.createDataFrame([("def parse_request(x): return Foo.bar[1]",)], "content string")
    got = df.select(tokenize_code("content")).first()[0]
    assert got == ["def", "parse_request", "x", "return", "foo", "bar", "1"]


def test_tokenize_code_fast_equals_regex_reference(spark):
    """translate-based tokenizer == regex reference on code-like text."""
    from elasticsearch_batch_percolator_spark.functions.tokenizer import (
        tokenize_code_regex,
    )
    from pyspark.sql import functions as F

    samples = [
        ("def f(x):\n\treturn {x: [1, 2]}  # comment!",),
        ('class A:\r\n  b = "s+t\'r"; c=a|b&d^e~f',),
        ("x%y$z@w#v*u",),
        ("",),
        ("   ",),
        ("snake_case CamelCase UPPER_CASE123",),
        # full ASCII control range + DEL are separators too (stray bytes
        # from misclassified binary content must split exactly like the
        # regex oracle — the equivalence claim covers ALL ASCII)
        ("a\x00b\x01c\x08d\x0ee\x1ff\x7fg",),
        ("tok\x00\x07\x1b\x7f tok2",),
    ]
    df = spark.createDataFrame(samples, "content string").union(
        synth_corpus(spark, 100, partitions=2).select("content")
    )
    mismatch = df.select(
        tokenize_code("content").alias("fast"),
        tokenize_code_regex("content").alias("ref"),
    ).filter(F.col("fast") != F.col("ref"))
    assert mismatch.count() == 0


def test_synth_corpus_deterministic_across_partitioning(spark):
    a = synth_corpus(spark, 200, partitions=1).orderBy("repo", "path", "commit").collect()
    b = synth_corpus(spark, 200, partitions=7).orderBy("repo", "path", "commit").collect()
    assert a == b
    assert len(a) == 200


def test_sha256_invariant(spark):
    corpus = with_sha256(with_doc_ids(synth_corpus(spark, 50, partitions=3)))
    rows = corpus.select("content", "content_sha256").collect()
    for r in rows:
        assert r["content_sha256"] == hashlib.sha256(r["content"].encode()).hexdigest()


def test_doc_ids_dense_and_stable(spark):
    c = with_doc_ids(synth_corpus(spark, 100, partitions=5))
    ids = [r[0] for r in c.select("doc_id").orderBy("doc_id").collect()]
    assert ids == list(range(100))
    # stable: same ids for same (repo,path,commit) regardless of partitioning
    c2 = with_doc_ids(synth_corpus(spark, 100, partitions=2))
    j = c.select("repo", "path", "commit", "doc_id").join(
        c2.select("repo", "path", "commit", F.col("doc_id").alias("doc_id2")),
        ["repo", "path", "commit"],
    )
    assert j.filter(F.col("doc_id") != F.col("doc_id2")).count() == 0


def test_zipf_skew_present(spark):
    """Hot terms must dominate — this is what exercises salting at scale."""
    corpus = synth_corpus(spark, 300, partitions=4)
    tf = (
        corpus.select(F.explode(tokenize_ws("content")).alias("term"))
        .groupBy("term")
        .count()
        .orderBy(F.desc("count"))
        .limit(1)
        .first()
    )
    assert tf["term"] == "the"  # Zipf rank-1 term
