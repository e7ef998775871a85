"""Prefix queries + match operator and/or + terms minimum_match soak vs
eval_plan — the DSL shapes no earlier generator emitted."""
import random, sys, time
import os; _R = os.path.dirname(os.path.dirname(os.path.abspath(__file__))); sys.path.insert(0, _R); sys.path.insert(0, os.path.join(_R, "tests"))
import test_multi_field_random as M
from elasticsearch_batch_percolator_spark.operators.percolate import percolate
from elasticsearch_batch_percolator_spark.plans.eval_py import eval_plan
from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry
from elasticsearch_batch_percolator_spark.session import get_spark

spark = get_spark("ebp-soak-px", cores=8)
spark.sparkContext.setLogLevel("ERROR")
V = ["apple", "apricot", "banana", "berry", "cherry", "api", "ap", "band"]
base = random.Random(727272)
t0 = time.time()
FIELDS = {"f1": "f1", "f2": "f2"}
for it in range(6):
    seed = base.randrange(1 << 63)
    rng = random.Random(seed)
    qs = {}
    for j in range(60):
        f = rng.choice(["f1", "f2"])
        k = j % 4
        if k == 0:
            qs[f"q{j}"] = {"prefix": {f: rng.choice(["ap", "ban", "b", "cherr", "z"])}}
        elif k == 1:
            qs[f"q{j}"] = {"match": {f: {"query": " ".join(rng.choices(V, k=rng.randint(1, 3))),
                                          "operator": rng.choice(["and", "or"])}}}
        elif k == 2:
            qs[f"q{j}"] = {"match": {f: " ".join(rng.choices(V, k=rng.randint(2, 4)))}}
        else:
            body = {f: [rng.choice(V) for _ in range(rng.randint(2, 4))]}
            body["minimum_match"] = rng.randint(1, 2)
            qs[f"q{j}"] = {"terms": body}
    reg = CompiledRegistry.from_rows(list(qs.items()))
    docs = [(i, " ".join(rng.choices(V, k=rng.randint(0, 7))),
                " ".join(rng.choices(V, k=rng.randint(0, 7)))) for i in range(150)]
    df = spark.createDataFrame(docs, "doc_id long, f1 string, f2 string")
    res = percolate(spark, df, reg, fields=FIELDS)
    got = {(int(r["doc_id"]), r["query_id"]) for r in res.matches.collect()}
    res.unpersist()
    exp = set()
    for i, f1, f2 in docs:
        d = {"f1": f1.split() if f1 else [], "f2": f2.split() if f2 else []}
        for qid, cq in reg.queries.items():
            if eval_plan(cq.plan, d):
                exp.add((i, qid))
    assert got == exp, (f"seed {seed}: missing={sorted(exp-got)[:6]} "
                        f"extra={sorted(got-exp)[:6]}")
    print(f"it{it} seed={seed}: ok |exp|={len(exp)} [{time.time()-t0:.0f}s]", flush=True)
print("PASS")
spark.stop()
