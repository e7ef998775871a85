"""Registry mutation soak: percolate -> unregister random subset +
register fresh queries -> percolate again, repeatedly, on one registry
object — every round must equal eval_plan ground truth (catches stale
batch-plan/prune/broadcast caches keyed on registry.version)."""
import random, sys, time
import os; _R = os.path.dirname(os.path.dirname(os.path.abspath(__file__))); sys.path.insert(0, _R); sys.path.insert(0, os.path.join(_R, "tests"))
import test_multi_field_random as M
from elasticsearch_batch_percolator_spark.operators.percolate import percolate
from elasticsearch_batch_percolator_spark.plans.eval_py import eval_plan
from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry
from elasticsearch_batch_percolator_spark.session import get_spark

spark = get_spark("ebp-soak-mut", cores=8)
spark.sparkContext.setLogLevel("ERROR")
FIELDS = {"f1": "f1", "f2": "f2", "num": ("num", "numeric"), "kids": ("kids", "nested")}
base = random.Random(int(os.environ.get("META_SEED", "191919")))
t0 = time.time()
for it in range(3):
    seed = base.randrange(1 << 63)
    rng = random.Random(seed)
    queries = {f"q{i}": M._rand_query(rng) for i in range(150)}
    reg = CompiledRegistry.from_rows(list(queries.items()))
    docs = [M._rand_doc(rng, i) for i in range(100)]
    df = spark.createDataFrame(
        docs, "doc_id long, f1 string, f2 string, num long, "
              "kids array<struct<ct: array<string>>>")
    nxt = 150
    for rnd in range(5):
        res = percolate(spark, df, reg, fields=FIELDS)
        got = {(int(r["doc_id"]), r["query_id"]) for r in res.matches.collect()}
        res.unpersist()
        exp = set()
        for i, f1, f2, num, kids in docs:
            d = {"f1": f1.split() if f1 else [], "f2": f2.split() if f2 else [],
                 "kids": [{"ct": list(k[0])} for k in kids]}
            if num is not None:
                d["num"] = num
            for qid, cq in reg.queries.items():
                if eval_plan(cq.plan, d):
                    exp.add((i, qid))
        assert got == exp, (f"seed {seed} round {rnd}: "
                            f"missing={sorted(exp-got)[:5]} extra={sorted(got-exp)[:5]}")
        # mutate: drop ~20 random, add ~20 fresh
        for qid in rng.sample(sorted(queries), 20):
            reg.unregister(qid); del queries[qid]
        for _ in range(20):
            q = M._rand_query(rng)
            reg.register(f"q{nxt}", q); queries[f"q{nxt}"] = q; nxt += 1
    print(f"it{it} seed={seed}: ok 5 mutation rounds [{time.time()-t0:.0f}s]", flush=True)
print("PASS")
spark.stop()
