"""Q10 nested block join: parent matches iff ONE child satisfies the query.

The reference passes ToParentBlockJoinQuery through its limiting filter as
its own approximation (LimitingFilterFactory.java:68-72); here Nested is a
first-class plan: Catalyst `exists` over an array<struct> children column
(match path), per-child evaluation in eval_plan (verify path), and a
flattened-fields over-approximation for phase-1 gating.
"""

from pyspark.sql import functions as F

from elasticsearch_batch_percolator_spark.operators.match import match_col
from elasticsearch_batch_percolator_spark.operators.percolate import percolate
from elasticsearch_batch_percolator_spark.plans.compiler import compile_query
from elasticsearch_batch_percolator_spark.plans.eval_py import eval_plan
from elasticsearch_batch_percolator_spark.plans.limiting import limiting_filter
from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry

NESTED_Q = {
    "nested": {
        "path": "children",
        "query": {"bool": {"must": [{"term": {"ctoks": "a"}},
                                     {"term": {"ctoks": "b"}}]}},
    }
}

# doc 1: one child has BOTH a and b -> matches
# doc 2: a and b split ACROSS children -> flat bool would match, nested must NOT
# doc 3: no a at all -> no match
DOCS = [
    (1, [(["a", "b", "x"],), (["c"],)]),
    (2, [(["a", "x"],), (["b", "y"],)]),
    (3, [(["c", "b"],), (["d"],)]),
]
SCHEMA = "doc_id long, children array<struct<ctoks: array<string>>>"


def test_eval_plan_nested_semantics():
    plan = compile_query(NESTED_Q)
    doc1 = {"children": [{"ctoks": ["a", "b", "x"]}, {"ctoks": ["c"]}]}
    doc2 = {"children": [{"ctoks": ["a", "x"]}, {"ctoks": ["b", "y"]}]}
    assert eval_plan(plan, doc1) is True
    assert eval_plan(plan, doc2) is False  # the block-join distinction
    assert eval_plan(plan, {"children": []}) is False
    assert eval_plan(plan, {}) is False


def test_nested_limiting_filter_is_flattened_superset():
    plan = compile_query(NESTED_Q)
    approx = limiting_filter(plan)
    # flattened over-approximation: parent stream must contain both terms
    from elasticsearch_batch_percolator_spark.plans.query_plan import Bool, Term

    assert approx == Bool(must=(Term("children", "a"), Term("children", "b")))
    # superset: doc2 (split across children) passes the approx but not exact
    assert eval_plan(approx, {"children": ["a", "x", "b", "y"]}) is True


def test_match_col_nested_exists(spark):
    plan = compile_query(NESTED_Q)
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = sorted(
        r["doc_id"]
        for r in df.filter(match_col(plan, {"children": F.col("children")})).collect()
    )
    assert got == [1]


def test_match_col_nested_wildcard(spark):
    plan = compile_query(
        {"nested": {"path": "children",
                    "query": {"wildcard": {"ctoks": "c*"}}}}
    )
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = sorted(
        r["doc_id"]
        for r in df.filter(match_col(plan, {"children": F.col("children")})).collect()
    )
    assert got == [1, 3]


def test_percolate_nested_field(spark):
    """End-to-end percolation over a nested column (columnar + python paths)."""
    queries = {
        "q-both": NESTED_Q,
        "q-span": {  # positional inner -> python verify path
            "nested": {
                "path": "children",
                "query": {"span_near": {"clauses": [{"span_term": {"ctoks": "a"}},
                                                     {"span_term": {"ctoks": "b"}}],
                                        "slop": 0, "in_order": True}},
            }
        },
        "q-flat": {"term": {"flat": "z"}},
    }
    reg = CompiledRegistry.from_rows(list(queries.items()))
    docs = spark.createDataFrame(
        [(d, kids, "z z") for d, kids in DOCS],
        SCHEMA + ", flat string",
    )
    res = percolate(
        spark, docs, reg,
        fields={"children": ("children", "nested"), "flat": "flat"},
    )
    got = {(int(r["doc_id"]), r["query_id"]) for r in res.matches.collect()}
    assert got == {
        (1, "q-both"), (1, "q-span"),
        (1, "q-flat"), (2, "q-flat"), (3, "q-flat"),
    }


def test_percolate_nested_scalar_child_isolation(spark):
    """A non-array child field (numeric weight) in the nested struct must
    not abort the verify batch: scalar children pass through the nested
    view (only array children become lists), so unrelated queries on the
    same docs keep matching (E10 per-query isolation)."""
    queries = {
        "q-span": {  # positional inner -> python verify path builds views
            "nested": {
                "path": "children",
                "query": {"span_near": {"clauses": [{"span_term": {"ctoks": "a"}},
                                                     {"span_term": {"ctoks": "b"}}],
                                        "slop": 0, "in_order": True}},
            }
        },
        "q-flat": {"term": {"flat": "z"}},
    }
    reg = CompiledRegistry.from_rows(list(queries.items()))
    docs = spark.createDataFrame(
        [
            (1, [(["a", "b"], 7), (["c"], 9)], "z z"),
            (2, [(["a"], 1), (["b"], 2)], "z"),
        ],
        "doc_id long, children array<struct<ctoks: array<string>, weight: long>>, "
        "flat string",
    )
    res = percolate(
        spark, docs, reg,
        fields={"children": ("children", "nested"), "flat": "flat"},
    )
    got = {(int(r["doc_id"]), r["query_id"]) for r in res.matches.collect()}
    assert got == {(1, "q-span"), (1, "q-flat"), (2, "q-flat")}


def test_percolate_fcol_space_guard(spark):
    """>127 queried token columns cannot be tagged in the tinyint fcol
    space — percolate refuses loudly instead of wrapping silently."""
    import pytest

    n = 130
    queries = {f"q{i}": {"term": {f"f{i}": "x"}} for i in range(n)}
    reg = CompiledRegistry.from_rows(list(queries.items()))
    docs = spark.createDataFrame([(1, "x")], "doc_id long, c0 string")
    docs = docs.select(
        "doc_id", *[F.col("c0").alias(f"t{i}") for i in range(n)]
    )
    with pytest.raises(ValueError, match="tinyint fcol space"):
        percolate(
            spark, docs, reg,
            fields={f"f{i}": (f"t{i}", "ws") for i in range(n)},
        )


def test_nested_must_not_limiting_soundness():
    """Child-scope must_not must NOT survive the flatten-remap: child-lacks-t
    does not imply the parent stream lacks t (a sibling child may carry it).
    Regression: the approx used to keep must_not b, excluding doc1 — a true
    match — from phase 1."""
    q = {"nested": {"path": "children", "query": {"bool": {
        "must": [{"term": {"ctoks": "a"}}],
        "must_not": [{"term": {"ctoks": "b"}}]}}}}
    plan = compile_query(q)
    approx = limiting_filter(plan)
    from elasticsearch_batch_percolator_spark.plans.query_plan import Bool, Term

    assert approx == Bool(must=(Term("children", "a"),))
    # child1 {a}, child2 {b}: exact TRUE; flattened stream has both tokens
    doc = {"children": [{"ctoks": ["a"]}, {"ctoks": ["b"]}]}
    assert eval_plan(plan, doc) is True
    assert eval_plan(approx, {"children": ["a", "b"]}) is True


def test_nested_limiting_superset_randomized():
    """Randomized nested child-query trees (incl. must_not / should / msm /
    phrases / wildcards) over random multi-child docs: the flattened approx
    evaluated on the parent token stream must be a superset of the exact
    block-join eval."""
    import random

    rng = random.Random(158556155086072256)
    vocab = list("abcdef")

    def leaf():
        k = rng.randrange(4)
        if k == 0:
            return {"term": {"ctoks": rng.choice(vocab)}}
        if k == 1:
            return {"wildcard": {"field": "ctoks",
                                 "value": rng.choice(["a*", "?b", "*"])}}
        if k == 2:
            return {"phrase": {"field": "ctoks",
                               "terms": rng.choices(vocab, k=2)}}
        return {"term": {"ctoks": rng.choice(vocab)}}

    def tree(depth):
        if depth == 0 or rng.random() < 0.4:
            return leaf()
        body = {}
        for grp in ("must", "should", "must_not"):
            n = rng.randint(0, 2)
            if n:
                body[grp] = [tree(depth - 1) for _ in range(n)]
        if not body:
            return leaf()
        if body.get("should") and rng.random() < 0.4:
            body["minimum_should_match"] = rng.randint(1, len(body["should"]))
        return {"bool": body}

    n_checked = 0
    for _ in range(400):
        plan = compile_query({"nested": {"path": "children", "query": tree(3)}})
        approx = limiting_filter(plan)
        for _ in range(25):
            children = [
                {"ctoks": rng.choices(vocab, k=rng.randint(0, 5))}
                for _ in range(rng.randint(0, 4))
            ]
            doc = {"children": children}
            flat = {"children": [t for c in children for t in c["ctoks"]]}
            if eval_plan(plan, doc):
                n_checked += 1
                assert approx is None or eval_plan(approx, flat), (
                    f"approx excluded a true nested match\nplan={plan}\n"
                    f"approx={approx}\ndoc={doc}"
                )
    assert n_checked > 200  # the sweep actually exercised true matches
