"""BM25 scoring + top-k vs the slow Python oracle (rank-identity contract)."""

import duckdb
import pytest

from tests.util_oracle import bm25_oracle, tokenize_ws, topk_oracle


@pytest.fixture(scope="module")
def pydocs(sf_dir):
    rows = duckdb.sql(
        f"select doc_id, text from '{sf_dir}/documents.parquet'"
    ).fetchall()
    return {int(d): tokenize_ws(t) for d, t in rows}


@pytest.mark.parametrize(
    "terms",
    [["spark"], ["spark", "join"], ["the", "fox"], ["vector", "window", "batch"]],
)
def test_topk_rank_identity(engine, pydocs, terms):
    k = 10
    expected = topk_oracle(bm25_oracle(pydocs, terms), k)
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in engine.topk(terms, k).orderBy("rank").collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in expected]
    for (_, gs), (_, es) in zip(got, expected):
        assert abs(gs - es) < 1e-9


def test_require_all_semantics(engine, pydocs):
    terms = ["spark", "window"]
    res = {int(r["doc_id"]) for r in engine.topk(terms, 10_000, require_all=True).collect()}
    expected = {
        d for d, toks in pydocs.items() if all(t in toks for t in terms)
    }
    assert res == expected


def test_stats(engine, pydocs):
    n, avgdl = engine.stats
    assert n == len(pydocs)
    assert abs(avgdl - sum(len(t) for t in pydocs.values()) / len(pydocs)) < 1e-12
