"""Adversarial skew / query-shape stress through the full percolate
pipeline — the shapes a 100 TB corpus actually throws at phase 1:

- one 50k-token document among thousands of normal ones (token skew);
- a term present in EVERY document that is also a required gate term of
  many queries (worst-case gate selectivity: the gate join degenerates
  toward a cross product for those queries);
- degenerate query shapes: a 150-term slop-0 phrase, a 300-clause
  should-bool, minimum_should_match=100 over 200 shoulds, a pure
  must_not query (all-docs lane).

Correctness is pinned against eval_plan on a sampled doc set plus the
monster document; completion itself guards against the planner choking
on these shapes (a superlinear blowup times out the suite).
"""

import random

from elasticsearch_batch_percolator_spark.operators.percolate import percolate
from elasticsearch_batch_percolator_spark.plans.eval_py import eval_plan
from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry


def test_skewed_batch_and_degenerate_query_shapes(spark):
    rng = random.Random(2468)
    vocab = [f"w{i}" for i in range(500)]
    docs = []
    for i in range(5000):
        toks = ["everywhere"] + rng.choices(vocab, k=rng.randint(2, 30))
        docs.append((i, " ".join(toks)))
    monster = " ".join(rng.choices(vocab, k=50_000)) + " everywhere needle"
    docs.append((5000, monster))

    qs = {}
    for j in range(40):
        qs[f"ub{j}"] = {
            "bool": {"must": [{"term": {"content": "everywhere"}},
                              {"term": {"content": rng.choice(vocab)}}]}
        }
    tail = monster.split()[-151:]
    qs["bigphrase"] = {"phrase": {"field": "content", "terms": tail, "slop": 0}}
    qs["bigbool"] = {"bool": {"should": [
        {"term": {"content": rng.choice(vocab)}} for _ in range(300)]}}
    qs["bigmsm"] = {"bool": {"should": [
        {"term": {"content": rng.choice(vocab)}} for _ in range(200)],
        "minimum_should_match": 100}}
    qs["neg"] = {"bool": {"must_not": [{"term": {"content": "everywhere"}}]}}
    reg = CompiledRegistry.from_rows(list(qs.items()))

    df = spark.createDataFrame(docs, "doc_id long, content string").repartition(8)
    res = percolate(spark, df, reg)
    got = {(int(r["doc_id"]), r["query_id"]) for r in res.matches.collect()}
    res.unpersist()

    sample_ids = set(rng.sample(range(5000), 250)) | {5000}
    truth = set()
    for i, c in docs:
        if i not in sample_ids:
            continue
        d = {"content": c.split()}
        for qid, cq in reg.queries.items():
            if eval_plan(cq.plan, d):
                truth.add((i, qid))
    got_sample = {(i, q) for (i, q) in got if i in sample_ids}
    assert got_sample == truth, (
        f"missing={sorted(truth - got_sample)[:6]} "
        f"extra={sorted(got_sample - truth)[:6]}"
    )
    assert (5000, "bigphrase") in got
    assert (5000, "neg") not in got
    # the ubiquitous-term queries matched broadly (the stress is real)
    assert sum(1 for _, q in got if q.startswith("ub")) > 5000
