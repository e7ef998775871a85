"""Search paging/sort (E3/E4), scored percolation (E2), response sink (S7)."""

import json

import pytest
from pyspark.sql import functions as F

from elasticsearch_batch_percolator_spark.operators.percolate import percolate
from elasticsearch_batch_percolator_spark.operators.search import (
    SortNotSupportedError,
    search,
)
from elasticsearch_batch_percolator_spark.plans import compile_query
from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry
from elasticsearch_batch_percolator_spark.sources.response import to_response_json
from tests.util_oracle import bm25_oracle, tokenize_ws, topk_oracle


def test_search_paging_matches_topk(engine):
    plan = compile_query({"bool": {"should": [{"term": {"content": "spark"}}, {"term": {"content": "join"}}]}})
    page1 = search(engine, plan, k=5, from_=0).collect()
    page2 = search(engine, plan, k=5, from_=5).collect()
    full = engine.topk(["spark", "join"], 10).orderBy("rank").collect()
    got = [(r["rank"], r["doc_id"], r["score_r"]) for r in page1 + page2]
    exp = [(r["rank"], r["doc_id"], r["score_r"]) for r in full]
    assert got == exp


def test_search_filters_before_scoring(engine):
    """must_not docs are excluded even if they'd score high."""
    plan = compile_query(
        {"bool": {"must": [{"term": {"content": "spark"}}], "must_not": [{"term": {"content": "join"}}]}}
    )
    rows = search(engine, plan, k=10000).collect()
    docs = engine.docs.select("doc_id", "tokens").collect()
    by_id = {int(r["doc_id"]): list(r["tokens"]) for r in docs}
    for r in rows:
        toks = by_id[int(r["doc_id"])]
        assert "spark" in toks and "join" not in toks


def test_search_match_all_ranks_by_doc_id(engine):
    plan = compile_query({"match_all": {}})
    rows = search(engine, plan, k=5).collect()
    assert [int(r["doc_id"]) for r in rows] == [0, 1, 2, 3, 4]
    assert all(r["score_r"] == 0.0 for r in rows)


def test_search_sort_validation(engine):
    plan = compile_query({"term": {"content": "spark"}})
    with pytest.raises(SortNotSupportedError):
        search(engine, plan, sort="n_chars asc")
    search(engine, plan, sort="_score desc")  # plan construction only


def test_percolate_scores_match_batch_oracle(spark):
    """with_scores == python BM25 over the batch-local statistics."""
    docs = [
        (0, "the fox is here and the fox is fast"),
        (1, "youscan percolator fox"),
        (2, "bad wolf bad wolf"),
        (3, "spark join spark"),
    ]
    queries = {
        "q-fox": {"term": {"content": "fox"}},
        "q-bool": {"bool": {"must": [{"term": {"content": "bad"}}, {"term": {"content": "wolf"}}]}},
        "q-all": {"match_all": {}},
    }
    reg = CompiledRegistry.from_rows(list(queries.items()))
    res = percolate(spark, spark.createDataFrame(docs, "doc_id long, content string"), reg)
    got = {
        (int(r["doc_id"]), r["query_id"]): r["score"]
        for r in res.with_scores(reg).collect()
    }
    pydocs = {d: tokenize_ws(t) for d, t in docs}
    fox = bm25_oracle(pydocs, ["fox"])
    assert abs(got[(0, "q-fox")] - round(fox[0], 4)) < 1e-9
    assert abs(got[(1, "q-fox")] - round(fox[1], 4)) < 1e-9
    bw = bm25_oracle(pydocs, ["bad", "wolf"])
    assert abs(got[(2, "q-bool")] - round(bw[2], 4)) < 1e-9
    assert got[(3, "q-all")] == 0.0  # match_all: no scoring terms


def test_percolate_scores_boost_weighted(spark):
    """Round-5: per-clause boost is a multiplicative BM25 term weight in
    scored responses (weight = qtf × path boost × idf × norm). A single
    boosted term scales its contribution linearly, so a boost-2 query
    scores exactly 2× its unboosted twin; matching is unchanged."""
    docs = [
        (0, "the fox is here and the fox is fast"),
        (1, "youscan percolator fox"),
        (2, "bad wolf bad wolf"),
    ]
    queries = {
        "plain": {"term": {"content": "fox"}},
        "boosted": {"term": {"content": {"value": "fox", "boost": 2.0}}},
        "mixed": {"bool": {"must": [
            {"term": {"content": {"value": "bad", "boost": 3.0}}},
            {"term": {"content": "wolf"}},
        ]}},
    }
    reg = CompiledRegistry.from_rows(list(queries.items()))
    res = percolate(spark, spark.createDataFrame(docs, "doc_id long, content string"), reg)
    got = {
        (int(r["doc_id"]), r["query_id"]): r["score"]
        for r in res.with_scores(reg, round_to=None).collect()
    }
    # same match sets for plain vs boosted
    assert {(d, q) for d, q in got if q == "plain"} == {(0, "plain"), (1, "plain")}
    assert {(d, q) for d, q in got if q == "boosted"} == {(0, "boosted"), (1, "boosted")}
    for d in (0, 1):
        assert abs(got[(d, "boosted")] - 2.0 * got[(d, "plain")]) < 1e-9
    pydocs = {d: tokenize_ws(t) for d, t in docs}
    bad = bm25_oracle(pydocs, ["bad"])
    wolf = bm25_oracle(pydocs, ["wolf"])
    assert abs(got[(2, "mixed")] - (3.0 * bad[2] + wolf[2])) < 1e-9


def test_response_json_sink(spark):
    reg = CompiledRegistry.from_rows([("q", {"term": {"content": "fox"}})])
    docs = spark.createDataFrame(
        [(1, "the fox"), (2, "no match")], "doc_id long, content string"
    )
    per_doc = percolate(spark, docs, reg).per_doc()
    rows = {r["doc_id"]: json.loads(r["response_json"]) for r in to_response_json(per_doc).collect()}
    assert rows[1] == {"doc_id": 1, "matches": ["q"], "n_matches": 1}
    assert rows[2] == {"doc_id": 2, "matches": [], "n_matches": 0}
