"""Fuzzy / regexp / exists / constant_score / match_phrase_prefix /
query_string soak vs eval_plan — fresh-seed randomized percolation over a
small-edit-distance vocabulary (every fuzzy value has genuine 1-edit
neighbors), multi-field, both gate lanes (fuzzy/regexp expansion + verify).
"""
import random, sys, time
import os; _R = os.path.dirname(os.path.dirname(os.path.abspath(__file__))); sys.path.insert(0, _R); sys.path.insert(0, os.path.join(_R, "tests"))
from elasticsearch_batch_percolator_spark.operators.percolate import percolate
from elasticsearch_batch_percolator_spark.plans.eval_py import eval_plan
from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry
from elasticsearch_batch_percolator_spark.session import get_spark

spark = get_spark("ebp-soak-dslx", cores=8)
spark.sparkContext.setLogLevel("ERROR")
V = ["fox", "fix", "fax", "box", "foxx", "ox", "fog", "frog", "the", "a",
     "ab", "abc", "cab"]
RE_PATS = ["f.x", "(fox|box)", "f[aio]x", ".o.", "fr?og", "[bf]ox", "a.*",
           "c?ab?c?"]
QS = ["fox AND box", "fix OR fax", "+fox -box", "fo*", '"the fox"',
      "fox~1", "NOT (fox OR box)", "abc~2", "(fog OR frog) AND NOT a",
      '"a fox"~1', "f?x AND the"]
base = random.Random(int(os.environ.get("META_SEED", "818181")))
t0 = time.time()
FIELDS = {"f1": "f1", "f2": "f2"}
for it in range(int(os.environ.get("ROUNDS", "6"))):
    seed = base.randrange(1 << 63)
    rng = random.Random(seed)
    qs = {}
    for j in range(70):
        f = rng.choice(["f1", "f2"])
        k = j % 7
        if k == 0:
            qs[f"q{j}"] = {"fuzzy": {f: {"value": rng.choice(V),
                                         "fuzziness": rng.randint(1, 2),
                                         "prefix_length": rng.choice([0, 0, 1, 2])}}}
        elif k == 1:
            qs[f"q{j}"] = {"regexp": {f: rng.choice(RE_PATS)}}
        elif k == 2:
            qs[f"q{j}"] = {"query_string": {"query": rng.choice(QS),
                                            "default_field": f}}
        elif k == 3:
            qs[f"q{j}"] = {"match_phrase_prefix": {f: " ".join(
                rng.choices(["the fo", "a fo", "fr", "fox f"], k=1))}}
        elif k == 4:
            qs[f"q{j}"] = {"constant_score": {"filter": {
                "bool": {"must": [{"term": {f: rng.choice(V)}}],
                         "must_not": [{"fuzzy": {f: {"value": rng.choice(V),
                                                     "fuzziness": 1}}}]
                         if rng.random() < 0.5 else []}}}}
        elif k == 5:
            qs[f"q{j}"] = rng.choice([
                {"exists": {"field": f}},
                {"ids": {"values": [rng.randrange(170)
                                    for _ in range(rng.randint(1, 6))]}},
                {"bool": {"must": [{"term": {f: rng.choice(V)}}],
                          rng.choice(["filter", "must_not"]):
                          [{"ids": {"values": [str(rng.randrange(170))
                                               for _ in range(3)]}}]}},
                {"span_first": {"match": {"span_term": {f: rng.choice(V)}},
                                "end": rng.randint(1, 5)}},
                {"span_first": {"match": {"span_near": {"clauses": [
                    {"span_multi": {"match": {"fuzzy": {f: {
                        "value": rng.choice(V), "fuzziness": 1}}}}},
                    {"span_term": {f: rng.choice(V)}}],
                    "slop": rng.randint(0, 2), "in_order": True}},
                    "end": rng.randint(2, 6)}},
            ])
        else:  # fuzzy/regexp inside bools with the older shapes
            qs[f"q{j}"] = {"bool": {
                "must": [{"fuzzy": {f: {"value": rng.choice(V),
                                        "fuzziness": 1}}}],
                "should": [{"term": {f: rng.choice(V)}},
                           {"regexp": {f: rng.choice(RE_PATS)}}],
                "minimum_should_match": rng.choice([0, 1]) or None,
            }} if rng.random() < 0.7 else {"bool": {
                "must_not": [{"regexp": {f: rng.choice(RE_PATS)}}],
                "must": [{"term": {f: rng.choice(V)}}]}}
            if qs[f"q{j}"]["bool"].get("minimum_should_match") is None:
                qs[f"q{j}"]["bool"].pop("minimum_should_match", None)
    reg = CompiledRegistry.from_rows(list(qs.items()))
    docs = [(i, " ".join(rng.choices(V, k=rng.randint(0, 8))),
                " ".join(rng.choices(V, k=rng.randint(0, 8)))) for i in range(160)]
    df = spark.createDataFrame(docs, "doc_id long, f1 string, f2 string")
    res = percolate(spark, df, reg, fields=FIELDS)
    got = {(int(r["doc_id"]), r["query_id"]) for r in res.matches.collect()}
    res.unpersist()
    exp = set()
    for i, f1, f2 in docs:
        d = {"f1": f1.split() if f1 else [], "f2": f2.split() if f2 else [],
             "_id": i}
        for qid, cq in reg.queries.items():
            if eval_plan(cq.plan, d):
                exp.add((i, qid))
    assert got == exp, (f"seed {seed}: missing={sorted(exp-got)[:6]} "
                        f"extra={sorted(got-exp)[:6]}")
    print(f"it{it} seed={seed}: ok |exp|={len(exp)} [{time.time()-t0:.0f}s]", flush=True)
print("PASS")
spark.stop()
