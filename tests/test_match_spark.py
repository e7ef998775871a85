"""Catalyst match predicate == Python exact evaluator, plus the reference's
golden scenarios (SimplePercolationTests.java:42-109, APITests.java:190-247).
"""

import random

import pytest
from pyspark.sql import functions as F

from elasticsearch_batch_percolator_spark.functions.tokenizer import tokenize_ws
from elasticsearch_batch_percolator_spark.operators.match import match_col, wildcard_to_like
from elasticsearch_batch_percolator_spark.plans import (
    Bool,
    MatchAll,
    Phrase,
    Range,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanTerm,
    Term,
    Wildcard,
    WildcardPhrase,
    compile_query,
)
from elasticsearch_batch_percolator_spark.plans.eval_py import eval_plan

FIELD = "content"
VOCAB = list("abcdefgh")


def _random_plans(rng, n):
    out = []
    for _ in range(n):
        kind = rng.randrange(8)
        if kind == 0:
            out.append(Term(FIELD, rng.choice(VOCAB)))
        elif kind == 1:
            out.append(Wildcard(FIELD, rng.choice(["a*", "?b", "c?", "*e*", "*", "f?h"])))
        elif kind == 2:
            out.append(Phrase(FIELD, tuple(rng.choices(VOCAB, k=rng.randint(2, 3)))))
        elif kind == 3:
            out.append(Phrase(FIELD, tuple(rng.choices(VOCAB, k=2)), slop=rng.randint(1, 2)))
        elif kind == 4:
            prods = tuple(
                Term(FIELD, rng.choice(VOCAB)) if rng.random() < 0.5
                else Wildcard(FIELD, rng.choice(["a*", "?b"]))
                for _ in range(rng.randint(1, 3))
            )
            out.append(WildcardPhrase(FIELD, prods))
        elif kind == 5:
            cls = tuple(SpanTerm(FIELD, rng.choice(VOCAB)) for _ in range(rng.randint(1, 3)))
            out.append(SpanNear(cls, rng.randint(0, 3), rng.random() < 0.5))
        elif kind == 6:
            out.append(
                SpanNot(SpanTerm(FIELD, rng.choice(VOCAB)), SpanTerm(FIELD, rng.choice(VOCAB)))
            )
        else:
            sub = _random_plans(rng, rng.randint(1, 2))
            shoulds = (
                tuple(Term(FIELD, rng.choice(VOCAB)) for _ in range(rng.randint(1, 3)))
                if rng.random() < 0.5
                else ()
            )
            out.append(
                Bool(
                    must=tuple(sub),
                    must_not=(Term(FIELD, rng.choice(VOCAB)),) if rng.random() < 0.5 else (),
                    should=shoulds,
                    # minimum_should_match half the time shoulds exist
                    msm=rng.randint(1, len(shoulds)) if shoulds and rng.random() < 0.5 else 0,
                )
            )
    return out


def test_match_col_equals_eval_py(spark):
    rng = random.Random(158556155086072256)  # the reference's fixed seed
    docs = [
        (i, " ".join(rng.choices(VOCAB, k=rng.randint(0, 12)))) for i in range(300)
    ]
    plans = _random_plans(rng, 40) + [
        SpanOr((SpanTerm(FIELD, "a"), SpanNear((SpanTerm(FIELD, "b"), SpanTerm(FIELD, "c")), 1, True))),
        MatchAll(),
        Range("n", gte=3, lte=7),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").withColumn(
        "tokens", tokenize_ws("text")
    ).withColumn("n", F.col("doc_id") % 10)
    cols = [
        match_col(p, {FIELD: F.col("tokens")}, {"n": F.col("n")}).alias(f"m{i}")
        for i, p in enumerate(plans)
    ]
    rows = df.select("doc_id", "text", "n", *cols).collect()
    for r in rows:
        pydoc = {FIELD: [t for t in r["text"].lower().split(" ") if t], "n": r["n"]}
        for i, p in enumerate(plans):
            assert r[f"m{i}"] == eval_plan(p, pydoc), (
                f"plan={p}\ndoc={pydoc}\nspark={r[f'm{i}']}"
            )


def test_wildcard_to_like():
    assert wildcard_to_like("fo*") == "fo%"
    assert wildcard_to_like("f?x") == "f_x"
    assert wildcard_to_like("50%_a") == r"50\%\_a"


def _match_set(spark, queries: dict[str, dict], docs: list[tuple[int, str]]) -> set[tuple[int, str]]:
    df = spark.createDataFrame(docs, "doc_id long, text string").withColumn(
        "tokens", tokenize_ws("text")
    )
    out = set()
    for qid, qjson in queries.items():
        plan = compile_query(qjson)
        hits = df.filter(match_col(plan, {FIELD: F.col("tokens")})).select("doc_id").collect()
        out |= {(int(r[0]), qid) for r in hits}
    return out


def test_simple_percolation_golden(spark):
    """SimplePercolationTests.java:42-109 — doc 'b' matches exactly {term-b, match_all}."""
    queries = {
        "1": {"term": {"content": "b"}},
        "2": {"term": {"content": "c"}},
        "3": {"bool": {"must": [{"term": {"content": "b"}}, {"term": {"content": "c"}}]}},
        "4": {"match_all": {}},
    }
    got = _match_set(spark, queries, [(0, "b")])
    assert got == {(0, "1"), (0, "4")}
    # doc with both b and c matches 1,2,3,4 (SimplePercolationTests.java:67-74)
    got2 = _match_set(spark, queries, [(1, "b c")])
    assert got2 == {(1, "1"), (1, "2"), (1, "3"), (1, "4")}


def test_api_tests_golden(spark):
    """APITests.java:190-247 — 3-doc batch, expected per-doc match counts {2,2,1}."""
    queries = {
        "q-fox": {"term": {"content": "fox"}},
        "q-youscan": {"term": {"content": "youscan"}},
        "q-all": {"match_all": {}},
    }
    docs = [(1, "the fox is here"), (2, "youscan percolator"), (3, "bad wolf")]
    got = _match_set(spark, queries, docs)
    per_doc = {d: sum(1 for dd, _ in got if dd == d) for d in (1, 2, 3)}
    assert per_doc == {1: 2, 2: 2, 3: 1}
    assert (1, "q-fox") in got and (2, "q-youscan") in got


@pytest.mark.parametrize(
    "qjson,text,expected",
    [
        ({"phrase": {"field": "content", "terms": ["the", "fox"]}}, "the fox is here", True),
        ({"phrase": {"field": "content", "terms": ["the", "fox"]}}, "fox the here", False),
        ({"wildcard": {"content": "fo*"}}, "the fox", True),
        ({"wildcard": {"content": "fo*"}}, "the dog", False),
        ({"bool": {"must_not": [{"term": {"content": "wolf"}}]}}, "bad wolf", False),
        ({"bool": {"must_not": [{"term": {"content": "wolf"}}]}}, "good dog", True),
        (
            {"span_near": {"clauses": [{"span_term": {"content": "quick"}}, {"span_term": {"content": "fox"}}], "slop": 1, "in_order": True}},
            "quick brown fox",
            True,
        ),
        (
            {"span_near": {"clauses": [{"span_term": {"content": "quick"}}, {"span_term": {"content": "fox"}}], "slop": 0, "in_order": True}},
            "quick brown fox",
            False,
        ),
    ],
)
def test_query_cases(spark, qjson, text, expected):
    got = _match_set(spark, {"q": qjson}, [(0, text)])
    assert ((0, "q") in got) == expected


def test_alias_filter_restricts_context(spark):
    """Q14: the alias filter ANDs into the percolation/search context
    (YPercolatorService.java:141-149) — a plain Catalyst WHERE over the
    token columns, composable with any downstream operator."""
    from elasticsearch_batch_percolator_spark.operators.match import alias_filter

    docs = spark.createDataFrame(
        [(1, ["spark", "fast"], 10), (2, ["spark", "slow"], 300), (3, ["flink"], 50)],
        "doc_id long, tokens array<string>, n long",
    )
    out = alias_filter(
        docs,
        {"bool": {"must": [{"term": {"content": "spark"}}],
                  "must_not": [{"term": {"content": "slow"}}]}},
        {"content": F.col("tokens")},
    )
    assert [r["doc_id"] for r in out.orderBy("doc_id").collect()] == [1]
    # numeric Range targets flow through value_fields
    out2 = alias_filter(
        docs, {"range": {"n": {"gte": 40}}}, {}, {"n": F.col("n")}
    )
    assert [r["doc_id"] for r in out2.orderBy("doc_id").collect()] == [2, 3]
