"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k on sf0.001.
``queries()`` / ``oracle_sql()`` — one pair per implemented operator from
SURVEY.md §2; the driver cross-checks them via DuckDB at sf0.01.

Conventions shared by every pair:
- tokenization = lowercase + split on ' ' + drop '' (functions/tokenizer.py
  tokenize_ws  ==  DuckDB list_filter(string_split(lower(text),' '), ...)).
- integer outputs cast to BIGINT on both sides; scores rounded to 4 decimals
  on both sides so last-ulp libm differences can't flip a hash.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from elasticsearch_batch_percolator_spark.engine import Engine  # noqa: E402
from elasticsearch_batch_percolator_spark.functions.tokenizer import tokenize_ws  # noqa: E402
from elasticsearch_batch_percolator_spark.operators.match import match_col  # noqa: E402
from elasticsearch_batch_percolator_spark.operators.percolate import percolate  # noqa: E402
from elasticsearch_batch_percolator_spark.plans import compile_query  # noqa: E402
from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry  # noqa: E402
from elasticsearch_batch_percolator_spark.index.build import build_index, read_manifest  # noqa: E402
from elasticsearch_batch_percolator_spark.operators.wand import topk_from_index  # noqa: E402

K1, B = 1.2, 0.75

# DuckDB CTE prelude shared by token-level oracles (documents view is
# pre-registered by the driver).
_TOK_CTES = """
tok AS (
  SELECT doc_id, u.term AS term
  FROM documents,
       unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS u(term)
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl
)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", tokenize_ws("text").alias("tokens")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 for a 2-term query on sf0.001 documents."""
    eng = Engine.from_documents(spark, "/root/testdata/sf0.001")
    return (
        eng.topk(["spark", "join"], k=10)
        .select(
            F.col("rank").cast("long").alias("rank"),
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("score_r").alias("score_r"),
        )
    )


# ---------------------------------------------------------------- queries --

def _q_term_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 TermQuery — posting lookup as array_contains on the doc side."""
    return (
        _tokens(spark, sf_dir)
        .filter(F.array_contains("tokens", "spark"))
        .select(F.col("doc_id").cast("long").alias("doc_id"))
    )


def _q_bool_must(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 BooleanQuery MUST — AND of term containments."""
    return (
        _tokens(spark, sf_dir)
        .filter(F.array_contains("tokens", "spark") & F.array_contains("tokens", "window"))
        .select(F.col("doc_id").cast("long").alias("doc_id"))
    )


def _q_bool_should(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 BooleanQuery SHOULD — OR, >=1 must match."""
    return (
        _tokens(spark, sf_dir)
        .filter(F.array_contains("tokens", "fox") | F.array_contains("tokens", "wolf"))
        .select(F.col("doc_id").cast("long").alias("doc_id"))
    )


def _q_bool_must_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 MUST_NOT — negation (reference isNegated, LimitingFilterFactory.java:122-127)."""
    return (
        _tokens(spark, sf_dir)
        .filter(F.array_contains("tokens", "spark") & ~F.array_contains("tokens", "join"))
        .select(F.col("doc_id").cast("long").alias("doc_id"))
    )


def _q_match_all_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 MatchAllDocsQuery + E5 count-only mode."""
    return _docs(spark, sf_dir).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))


def _q_df_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term dictionary with document frequencies (index-build statistics)."""
    eng = Engine.from_documents(spark, sf_dir)
    return eng.dfreq.select("term", F.col("df").cast("long").alias("df"))


def _q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2+E3: BM25 scoring + deterministic top-k (the flagship)."""
    eng = Engine.from_documents(spark, sf_dir)
    return eng.topk(["spark", "join"], k=10).select(
        F.col("rank").cast("long").alias("rank"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("score_r").alias("score_r"),
    )


def _q_wildcard_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 WildcardQuery — pattern expansion, exercised via the compiled plan."""
    plan = compile_query({"wildcard": {"text": "sp*"}})
    return (
        _tokens(spark, sf_dir)
        .filter(match_col(plan, {"text": F.col("tokens")}))
        .select(F.col("doc_id").cast("long").alias("doc_id"))
    )


def _q_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 PhraseQuery — positional adjacency via exists-over-sequence."""
    plan = compile_query({"phrase": {"field": "text", "terms": ["the", "fast"]}})
    return (
        _tokens(spark, sf_dir)
        .filter(match_col(plan, {"text": F.col("tokens")}))
        .select(F.col("doc_id").cast("long").alias("doc_id"))
    )


_PERC_QUERIES = {
    "q-term": {"term": {"text": "fox"}},
    "q-bool": {"bool": {"must": [{"term": {"text": "spark"}}, {"term": {"text": "window"}}]}},
    "q-phrase": {"phrase": {"field": "text", "terms": ["the", "fast"]}},
    "q-wild": {"wildcard": {"text": "merg*"}},
    "q-not": {"bool": {"must": [{"term": {"text": "vector"}}], "must_not": [{"term": {"text": "wolf"}}]}},
}


def _q_percolate_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP1 batch percolation: registered query set × doc batch → matches
    (the reference's core; per-query loop re-expressed as one joined plan)."""
    reg = CompiledRegistry.from_rows(list(_PERC_QUERIES.items()))
    docs = _docs(spark, sf_dir).select("doc_id", F.col("text").alias("content"))
    res = percolate(spark, docs, reg)
    return res.matches.select(F.col("doc_id").cast("long").alias("doc_id"), "query_id")


def _q_percolate_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 count-only mode over the same registered set."""
    reg = CompiledRegistry.from_rows(list(_PERC_QUERIES.items()))
    docs = _docs(spark, sf_dir).select("doc_id", F.col("text").alias("content"))
    return percolate(spark, docs, reg).counts()


def _ensure_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (once) the compressed inverted index for a fixture dir."""
    import hashlib

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    out = f"/tmp/ebp_index_{tag}"
    m = read_manifest(out)
    if m is None or len(m.completed) < m.n_segments:
        docs = _tokens(spark, sf_dir)
        build_index(spark, docs, out, n_segments=4, lineage=sf_dir)
    return out


def _q_bm25_topk_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2+E3 via the compressed index + block-max WAND — same oracle as
    the join-based scorer (rank-identity is the contract)."""
    idx = _ensure_index(spark, sf_dir)
    return topk_from_index(spark, idx, {"q": ["spark", "join"]}, k=10).select(
        F.col("rank").cast("long").alias("rank"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("score_r").alias("score_r"),
    )


def _q_index_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index round-trip integrity: decode blocks back to (term, df, cf) and
    compare against token-level SQL over the raw corpus — validates the
    varint/delta codec through the driver gate."""
    import pandas as pd

    from elasticsearch_batch_percolator_spark.index.codec import decode_block

    idx = _ensure_index(spark, sf_dir)

    def decode_rows(batches):
        for pdf in batches:
            terms, dfs, cfs = [], [], []
            for r in pdf.itertuples():
                n_docs = 0
                tf_sum = 0
                for blk in r.blocks:
                    d, t, _ = decode_block(blk)
                    n_docs += len(d)
                    tf_sum += int(t.sum())
                terms.append(r.term)
                dfs.append(n_docs)
                cfs.append(tf_sum)
            yield pd.DataFrame({"term": terms, "df_decoded": dfs, "cf_decoded": cfs})

    return (
        spark.read.parquet(f"{idx}/postings")
        .mapInPandas(decode_rows, "term string, df_decoded long, cf_decoded long")
        .groupBy("term")
        .agg(
            F.sum("df_decoded").cast("long").alias("df"),
            F.sum("cf_decoded").cast("long").alias("cf"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "term_lookup": _q_term_lookup,
        "bool_must": _q_bool_must,
        "bool_should": _q_bool_should,
        "bool_must_not": _q_bool_must_not,
        "match_all_count": _q_match_all_count,
        "df_stats": _q_df_stats,
        "bm25_topk": _q_bm25_topk,
        "wildcard_match": _q_wildcard_match,
        "phrase_match": _q_phrase_match,
        "percolate_batch": _q_percolate_batch,
        "percolate_counts": _q_percolate_counts,
        "bm25_topk_wand": _q_bm25_topk_wand,
        "index_term_stats": _q_index_term_stats,
    }


def oracle_sql() -> dict[str, str]:
    contains = (
        "list_contains(list_filter(string_split(lower(text), ' '), x -> x <> ''), '{t}')"
    )
    has_like = (
        "len(list_filter(string_split(lower(text), ' '), t -> t LIKE '{p}')) > 0"
    )
    phrase = "contains(' ' || lower(text) || ' ', ' {p} ')"
    perc_union = " UNION ALL ".join(
        [
            f"SELECT doc_id, 'q-term' AS query_id FROM documents WHERE {contains.format(t='fox')}",
            f"SELECT doc_id, 'q-bool' AS query_id FROM documents WHERE {contains.format(t='spark')} AND {contains.format(t='window')}",
            f"SELECT doc_id, 'q-phrase' AS query_id FROM documents WHERE {phrase.format(p='the fast')}",
            f"SELECT doc_id, 'q-wild' AS query_id FROM documents WHERE {has_like.format(p='merg%')}",
            f"SELECT doc_id, 'q-not' AS query_id FROM documents WHERE {contains.format(t='vector')} AND NOT {contains.format(t='wolf')}",
        ]
    )
    out = {
        "index_term_stats": (
            f"WITH {_TOK_CTES} "
            "SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY term"
        ),
        "wildcard_match": f"SELECT doc_id FROM documents WHERE {has_like.format(p='sp%')}",
        "phrase_match": f"SELECT doc_id FROM documents WHERE {phrase.format(p='the fast')}",
        "percolate_batch": perc_union,
        "percolate_counts": (
            f"SELECT query_id, count(*)::BIGINT AS n_matches FROM ({perc_union}) GROUP BY query_id"
        ),
        "term_lookup": f"SELECT doc_id FROM documents WHERE {contains.format(t='spark')}",
        "bool_must": (
            f"SELECT doc_id FROM documents WHERE {contains.format(t='spark')} "
            f"AND {contains.format(t='window')}"
        ),
        "bool_should": (
            f"SELECT doc_id FROM documents WHERE {contains.format(t='fox')} "
            f"OR {contains.format(t='wolf')}"
        ),
        "bool_must_not": (
            f"SELECT doc_id FROM documents WHERE {contains.format(t='spark')} "
            f"AND NOT {contains.format(t='join')}"
        ),
        "match_all_count": "SELECT count(*)::BIGINT AS n_docs FROM documents",
        "df_stats": f"WITH {_TOK_CTES} SELECT term, df FROM dfreq",
        "bm25_topk": f"""
WITH {_TOK_CTES},
q(term) AS (VALUES ('spark'), ('join')),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
            * tf.tf * ({K1} + 1) / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) ) AS score
  FROM tf
  JOIN q USING (term)
  JOIN dfreq d USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT row_number() OVER (ORDER BY round(score, 4) DESC, doc_id)::BIGINT AS rank,
       doc_id, round(score, 4) AS score_r
FROM scored
ORDER BY rank
LIMIT 10
""",
    }
    out["bm25_topk_wand"] = out["bm25_topk"]  # rank-identity: same oracle
    return out
