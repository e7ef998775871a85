"""Corpus source adapter: schema validation, id/sha derivation, invariant check."""

import hashlib

import pytest
from pyspark.sql import functions as F

from elasticsearch_batch_percolator_spark.corpus import synth_corpus
from elasticsearch_batch_percolator_spark.sources.corpus_source import (
    read_corpus,
    verify_sha_check,
)


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("corpus") / "tbl")
    synth_corpus(spark, 100, partitions=3).write.parquet(p)
    return p


def test_read_corpus_parquet(spark, corpus_path):
    df = read_corpus(spark, corpus_path)
    assert set(df.columns) == {
        "doc_id", "repo", "path", "commit", "lang", "content", "content_sha256"
    }
    r = df.orderBy("doc_id").first()
    assert r["content_sha256"] == hashlib.sha256(r["content"].encode()).hexdigest()
    assert df.count() == 100


def test_read_corpus_missing_columns(spark, tmp_path):
    p = str(tmp_path / "bad")
    spark.createDataFrame([(1, "x")], "doc_id long, content string").write.parquet(p)
    with pytest.raises(ValueError, match="missing columns"):
        read_corpus(spark, p)


def test_sha_invariant_detects_mutation(spark, corpus_path):
    corpus = read_corpus(spark, corpus_path)
    reference = spark.read.parquet(corpus_path)
    assert verify_sha_check(corpus, reference).count() == 0
    mutated = reference.withColumn(
        "content",
        F.when(F.col("doc_id") == 3, F.lit("tampered")).otherwise(F.col("content")),
    )
    bad = verify_sha_check(corpus, mutated).collect()
    assert len(bad) == 1
    with pytest.raises(ValueError, match="sha256 mismatch"):
        read_corpus(spark, corpus_path, verify_sha_against=mutated)
