"""span_first + span_multi — the remaining ES 1.x span-family surface.

span_first(match, end): the match span must END within the first ``end``
positions (Lucene SpanFirstQuery: spans.end() <= end with end() =
last-position + 1, i.e. inclusive-end <= end - 1).
span_multi wraps a multi-term query (wildcard / prefix / fuzzy / regexp)
for use inside span contexts — spans_of evaluates the wrapped atom
positionally.
"""

import random

import pytest
from pyspark.sql import functions as F

from elasticsearch_batch_percolator_spark.functions.tokenizer import tokenize_ws
from elasticsearch_batch_percolator_spark.operators.match import match_col
from elasticsearch_batch_percolator_spark.operators.percolate import percolate
from elasticsearch_batch_percolator_spark.plans.compiler import compile_query
from elasticsearch_batch_percolator_spark.plans.eval_py import eval_plan, spans_of
from elasticsearch_batch_percolator_spark.plans.limiting import limiting_filter
from elasticsearch_batch_percolator_spark.plans.query_plan import (
    Fuzzy,
    Regexp,
    SpanFirst,
    SpanNear,
    SpanTerm,
    Term,
    Wildcard,
)
from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry

FIELD = "content"
VOCAB = ["fox", "fix", "box", "fog", "the", "a"]


def test_compile_span_first_and_multi():
    p = compile_query(
        {"span_first": {"match": {"span_term": {"content": "fox"}}, "end": 3}}
    )
    assert p == SpanFirst(SpanTerm("content", "fox"), 3)
    w = compile_query({"span_multi": {"match": {"wildcard": {"content": "fo*"}}}})
    assert w == Wildcard("content", "fo*")
    fz = compile_query(
        {"span_multi": {"match": {"fuzzy": {"content": {"value": "fox",
                                                        "fuzziness": 1}}}}}
    )
    assert fz == Fuzzy("content", "fox", 1, 0)


def test_span_first_eval_semantics():
    # "fox" at positions 0 and 3; end=1 admits only the first
    doc = {FIELD: ["fox", "a", "the", "fox"]}
    assert eval_plan(SpanFirst(SpanTerm(FIELD, "fox"), 1), doc)
    assert not eval_plan(SpanFirst(SpanTerm(FIELD, "the"), 1), doc)
    assert eval_plan(SpanFirst(SpanTerm(FIELD, "the"), 3), doc)
    # a 2-wide near span ending at position 1 needs end >= 2
    near = SpanNear((SpanTerm(FIELD, "fox"), SpanTerm(FIELD, "a")), 0, True)
    assert not eval_plan(SpanFirst(near, 1), doc)
    assert eval_plan(SpanFirst(near, 2), doc)


def test_spans_of_fuzzy_regexp():
    doc = {FIELD: ["fix", "box", "nothing", "fog"]}
    assert spans_of(Fuzzy(FIELD, "fox", 1), doc) == [(0, 0), (1, 1), (3, 3)]
    assert spans_of(Regexp(FIELD, "f.."), doc) == [(0, 0), (3, 3)]


def test_span_first_limiting_superset():
    p = SpanFirst(SpanTerm(FIELD, "fox"), 2)
    assert limiting_filter(p) == Term(FIELD, "fox")
    # lossy (drops the position bound) -> must NOT survive under NOT
    assert limiting_filter(p, negated=True) is None


def test_span_first_randomized_match_col(spark):
    rng = random.Random(31337)
    docs = [
        (i, " ".join(rng.choices(VOCAB, k=rng.randint(0, 8))))
        for i in range(200)
    ]
    plans = []
    for _ in range(12):
        inner = rng.choice(
            [
                SpanTerm(FIELD, rng.choice(VOCAB)),
                Wildcard(FIELD, rng.choice(["fo*", "f?x"])),
                Fuzzy(FIELD, rng.choice(VOCAB), 1),
                SpanNear(
                    (SpanTerm(FIELD, rng.choice(VOCAB)),
                     SpanTerm(FIELD, rng.choice(VOCAB))),
                    rng.randint(0, 2), rng.random() < 0.5,
                ),
            ]
        )
        plans.append(SpanFirst(inner, rng.randint(1, 5)))
    df = spark.createDataFrame(docs, "doc_id long, text string").withColumn(
        "tokens", tokenize_ws("text")
    )
    cols = [
        match_col(p, {FIELD: F.col("tokens")}).alias(f"m{i}")
        for i, p in enumerate(plans)
    ]
    rows = df.select("doc_id", "text", *cols).collect()
    for r in rows:
        pydoc = {FIELD: [t for t in r["text"].lower().split(" ") if t]}
        for i, p in enumerate(plans):
            assert bool(r[f"m{i}"]) == eval_plan(p, pydoc), (
                f"plan={p}\ndoc={pydoc}"
            )


def test_span_first_percolate_end_to_end(spark):
    queries = {
        "sf": {"span_first": {"match": {"span_term": {"content": "fox"}},
                              "end": 2}},
        "sm": {"bool": {"must": [{"span_near": {
            "clauses": [
                {"span_multi": {"match": {"fuzzy": {
                    "content": {"value": "fox", "fuzziness": 1}}}}},
                {"span_term": {"content": "the"}},
            ], "slop": 0, "in_order": True}}]}},
    }
    reg = CompiledRegistry.from_rows(list(queries.items()))
    docs = [
        (0, "fox runs far"),     # sf (pos 0)
        (1, "a fox runs"),       # sf (ends at pos 2 == end)
        (2, "a b fox runs"),     # not sf (pos 3)
        (3, "fix the problem"),  # sm: fuzzy fox->fix adjacent 'the'
        (4, "the fix arrives"),  # not sm (order)
    ]
    docs_df = spark.createDataFrame(docs, "doc_id long, content string")
    res = percolate(spark, docs_df, reg)
    got = {(int(r["doc_id"]), r["query_id"]) for r in res.matches.collect()}
    assert got == {(0, "sf"), (1, "sf"), (3, "sm")}
