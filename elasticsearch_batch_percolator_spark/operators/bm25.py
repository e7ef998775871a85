"""Join-based BM25 scorer + deterministic top-k.

The reference scores matches with Lucene's similarity inside the per-query
search loop (BatchPercolatorService.java:347-394 — one ``executeSearch`` per
registered query). The Spark-native shape is set-oriented: ONE plan scores
ALL (query, doc) pairs — tokens joined to a broadcast query-term table, then
grouped. No loop, no custom code path; Catalyst broadcasts the small side
and whole-stage-codegens the arithmetic.

Formula (north_rule contract; ES 2.4's default was TF-IDF — BM25 is this
engine's upgrade):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    norm(t) = tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score   = sum_t idf(t) * norm(t)        k1=1.2, b=0.75

Determinism: ties broken by ascending doc_id; scores also exposed rounded
(`score_r`) so that last-ulp libm differences between engines (Spark JVM
``Math.log`` vs DuckDB libm) can never flip a rank in the oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1


def bm25_score_col(
    tf: Column,
    df: Column,
    dl: Column,
    n_docs: int,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> Column:
    """Per-(term, doc) BM25 contribution as a pure Catalyst expression."""
    idf = F.log(1.0 + (F.lit(float(n_docs)) - df + 0.5) / (df + 0.5))
    norm = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / F.lit(float(avgdl))))
    return idf * norm


def score_terms(
    tf: DataFrame,
    dl: DataFrame,
    dfreq: DataFrame,
    query_terms: DataFrame,
    n_docs: int,
    avgdl: float,
    require_all: bool = False,
) -> DataFrame:
    """Score every doc against every query in one joined plan.

    Inputs: ``tf`` (doc_id, term, tf) / ``dl`` (doc_id, dl) / ``dfreq``
    (term, df) / ``query_terms`` (query_id, term[, n_terms]).
    Output: (query_id, doc_id, score[, n_hit]).

    ``query_terms`` and ``dfreq``-restricted-to-query-terms are tiny →
    broadcast; the only shuffle is the final groupBy. With
    ``require_all=True`` docs must contain every query term (AND/MUST
    semantics, reference BooleanQuery MUST — LimitingFilterFactory.java:104-152).

    An optional ``w`` column on ``query_terms`` weights each (query, term)
    contribution multiplicatively (Lucene per-clause boost × query term
    frequency): score = sum_t w_t * idf(t) * norm(t). Absent ``w``,
    per-occurrence rows accumulate qtf implicitly, unchanged.
    """
    qt = query_terms
    if require_all and "n_terms" not in qt.columns:
        w = Window.partitionBy("query_id")
        qt = qt.withColumn("n_terms", F.count(F.lit(1)).over(w))
    qt = F.broadcast(qt.join(dfreq, "term", "left").fillna({"df": 0}))

    contrib = bm25_score_col(F.col("tf"), F.col("df"), F.col("dl"), n_docs, avgdl)
    if "w" in query_terms.columns:
        contrib = contrib * F.col("w")
    scored = tf.join(qt, "term").join(dl, "doc_id").withColumn("contrib", contrib)
    agg = [F.sum("contrib").alias("score"), F.count(F.lit(1)).alias("n_hit")]
    out = scored.groupBy("query_id", "doc_id").agg(*agg)
    if require_all:
        n_terms = query_terms.select("query_id").groupBy("query_id").count() \
            if "n_terms" not in query_terms.columns else None
        if n_terms is not None:
            out = out.join(F.broadcast(n_terms), "query_id").filter(
                F.col("n_hit") == F.col("count")
            ).drop("count")
        else:
            qn = query_terms.select("query_id", "n_terms").distinct()
            out = out.join(F.broadcast(qn), "query_id").filter(
                F.col("n_hit") == F.col("n_terms")
            ).drop("n_terms")
    return out


def bm25_topk(scored: DataFrame, k: int, round_to: int | None = 4) -> DataFrame:
    """Deterministic per-query top-k: score desc, doc_id asc tie-break.

    Rank on the ROUNDED score so sub-1e-4 cross-engine float noise cannot
    reorder; exact ties then break on doc_id — the reference's stable-order
    analog (setDocIdsToLoad, BatchPercolatorService.java:403-417).
    """
    rank_score = F.round("score", round_to) if round_to is not None else F.col("score")
    scored = scored.withColumn("score_r", rank_score)
    w = Window.partitionBy("query_id").orderBy(F.desc("score_r"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score_r", "score")
    )
