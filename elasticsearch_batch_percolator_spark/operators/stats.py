"""Corpus statistics: N, avgdl, per-term df, per-(term,doc) tf.

The reference gets these for free from Lucene segment stats inside
``queryPhase.execute`` (BatchPercolatorService.java:391). Here they are
plain aggregations — partial (map-side) combine + final merge, which is the
same partial/final split the reference's shard-merge performs
(TransportBatchPercolateAction.mergeResults:94-143).

All lengths/frequencies are integers, so ``avgdl = sum(dl)/N`` is an exact
rational evaluated once in float64 — identical on any engine and any
partitioning, which is what makes BM25 ranks reproducible (SURVEY.md §7
hard part 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_lengths(docs: DataFrame, tokens_col: str = "tokens", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, dl) — document length in tokens."""
    return docs.select(F.col(id_col), F.size(tokens_col).cast("long").alias("dl"))


def term_frequencies(docs: DataFrame, tokens_col: str = "tokens", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term, tf) via explode + groupBy (map-side partial agg)."""
    return (
        docs.select(F.col(id_col), F.explode(tokens_col).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_freq(tf: DataFrame) -> DataFrame:
    """(term, df) — rows of ``tf`` are distinct (doc, term) pairs already."""
    return tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def corpus_stats(docs: DataFrame, tokens_col: str = "tokens") -> tuple[int, float]:
    """(N, avgdl) as driver scalars — two numbers, one tiny job."""
    row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(tokens_col)).alias("total_dl"),
    ).first()
    n = int(row["n"])
    return n, (float(row["total_dl"]) / n if n else 0.0)
