"""Randomized multi-field + nested percolation oracle: random registries
over two text fields, a numeric field and a nested path, percolated against
random docs — Spark matches must EQUAL the pure-python eval_plan ground
truth on every (doc, query) pair. This is the round-1 randomized-percolate
rigor extended to every round-2 surface (fields, analyzers, numeric, nested).
"""

import random

from elasticsearch_batch_percolator_spark.operators.percolate import percolate
from elasticsearch_batch_percolator_spark.plans.eval_py import eval_plan
from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry

VOCAB = list("abcdefg")
SEED = 158556155086072256  # the reference's fixed seed, reused


def _rand_query(rng: random.Random) -> dict:
    kind = rng.randrange(8)
    f = rng.choice(["f1", "f2"])
    if kind == 0:
        return {"term": {f: rng.choice(VOCAB)}}
    if kind == 1:
        return {"wildcard": {f: rng.choice(["a*", "?b", "*c*", "d"])}}
    if kind == 2:
        return {"phrase": {"field": f, "terms": rng.choices(VOCAB, k=2)}}
    if kind == 3:
        lo = rng.randint(0, 5)
        return {"range": {"num": {"gte": lo, "lte": lo + rng.randint(0, 4)}}}
    if kind == 4:
        return {"nested": {"path": "kids",
                           "query": {"bool": {"must": [
                               {"term": {"ct": rng.choice(VOCAB)}},
                               {"term": {"ct": rng.choice(VOCAB)}}]}}}
                }
    if kind == 5:
        return {"bool": {"must": [_rand_query_leaf(rng), _rand_query_leaf(rng)],
                         "must_not": [_rand_query_leaf(rng)]}}
    if kind == 6:
        body = {"should": [_rand_query_leaf(rng), _rand_query_leaf(rng)]}
        if rng.random() < 0.5:
            body["minimum_should_match"] = 2
            if rng.random() < 0.5:
                body["must"] = [_rand_query_leaf(rng)]
        return {"bool": body}
    return {"span_near": {"clauses": [{"span_term": {f: rng.choice(VOCAB)}},
                                       {"span_term": {f: rng.choice(VOCAB)}}],
                          "slop": rng.randint(0, 2),
                          "in_order": rng.random() < 0.5}}


def _rand_query_leaf(rng: random.Random) -> dict:
    f = rng.choice(["f1", "f2"])
    if rng.random() < 0.5:
        return {"term": {f: rng.choice(VOCAB)}}
    return {"wildcard": {f: rng.choice(["a*", "?b", "d"])}}


def _rand_doc(rng: random.Random, i: int):
    f1 = " ".join(rng.choices(VOCAB, k=rng.randint(0, 8)))
    f2 = " ".join(rng.choices(VOCAB, k=rng.randint(0, 8)))
    num = rng.randint(0, 9) if rng.random() < 0.8 else None
    kids = [
        (rng.choices(VOCAB, k=rng.randint(0, 5)),)
        for _ in range(rng.randint(0, 3))
    ]
    return (i, f1, f2, num, kids)


def test_randomized_multi_field_oracle(spark):
    rng = random.Random(SEED)
    queries = {f"q{i}": _rand_query(rng) for i in range(300)}
    docs = [_rand_doc(rng, i) for i in range(120)]

    reg = CompiledRegistry.from_rows(list(queries.items()))
    df = spark.createDataFrame(
        docs,
        "doc_id long, f1 string, f2 string, num long, "
        "kids array<struct<ct: array<string>>>",
    )
    res = percolate(
        spark, df, reg,
        fields={"f1": "f1", "f2": "f2", "num": ("num", "numeric"),
                "kids": ("kids", "nested")},
    )
    got = {(int(r["doc_id"]), r["query_id"]) for r in res.matches.collect()}

    expected = set()
    for i, f1, f2, num, kids in docs:
        doc = {
            "f1": f1.split() if f1 else [],
            "f2": f2.split() if f2 else [],
            "kids": [{"ct": list(k[0])} for k in kids],
        }
        if num is not None:
            doc["num"] = num
        for qid, cq in reg.queries.items():
            if eval_plan(cq.plan, doc):
                expected.add((i, qid))

    missing = expected - got
    extra = got - expected
    assert not missing and not extra, (
        f"missing={sorted(missing)[:10]} extra={sorted(extra)[:10]} "
        f"(|expected|={len(expected)}, |got|={len(got)})"
    )
    assert len(expected) > 100  # the workload is non-trivial
