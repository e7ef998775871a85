"""Adversarial skew/shape stress through percolate:
- a 100k-token doc among 20k normal docs
- a term in EVERY doc that gates many queries (phase-1 explosion shape)
- a 200-term slop-0 phrase, a 400-clause bool, msm=150 over 300 shoulds
Correctness vs eval_plan on sampled docs; completion within bounds."""
import random, sys, time
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from elasticsearch_batch_percolator_spark.operators.percolate import percolate
from elasticsearch_batch_percolator_spark.plans.eval_py import eval_plan
from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry
from elasticsearch_batch_percolator_spark.session import get_spark

spark = get_spark("ebp-soak-skew", cores=8)
spark.sparkContext.setLogLevel("ERROR")
rng = random.Random(2468)
vocab = [f"w{i}" for i in range(500)]
docs = []
for i in range(20000):
    toks = ["everywhere"] + rng.choices(vocab, k=rng.randint(2, 30))
    docs.append((i, " ".join(toks)))
monster = " ".join(rng.choices(vocab, k=100_000)) + " everywhere needle"
docs.append((20000, monster))

qs = {}
# 60 queries requiring the ubiquitous term (worst-case gate selectivity)
for j in range(60):
    qs[f"ub{j}"] = {"bool": {"must": [{"term": {"content": "everywhere"}},
                                       {"term": {"content": rng.choice(vocab)}}]}}
# giant phrase: the monster doc's last tokens
tail = monster.split()[-201:]
qs["bigphrase"] = {"phrase": {"field": "content", "terms": tail, "slop": 0}}
# 400-clause bool (should), msm 150 of 300
qs["bigbool"] = {"bool": {"should": [{"term": {"content": rng.choice(vocab)}} for _ in range(400)]}}
qs["bigmsm"] = {"bool": {"should": [{"term": {"content": rng.choice(vocab)}} for _ in range(300)],
                          "minimum_should_match": 150}}
qs["neg"] = {"bool": {"must_not": [{"term": {"content": "everywhere"}}]}}
reg = CompiledRegistry.from_rows(list(qs.items()))

df = spark.createDataFrame(docs, "doc_id long, content string").repartition(16)
t0 = time.time()
res = percolate(spark, df, reg)
got = {(int(r["doc_id"]), r["query_id"]) for r in res.matches.collect()}
wall = time.time() - t0
res.unpersist()

# ground truth on a sample + the monster + all bigmsm-relevant docs
sample_ids = set(rng.sample(range(20000), 400)) | {20000}
truth = set()
for i, c in docs:
    if i not in sample_ids:
        continue
    d = {"content": c.split()}
    for qid, cq in reg.queries.items():
        if eval_plan(cq.plan, d):
            truth.add((i, qid))
got_sample = {(i, q) for (i, q) in got if i in sample_ids}
missing, extra = truth - got_sample, got_sample - truth
assert not missing and not extra, f"missing={sorted(missing)[:6]} extra={sorted(extra)[:6]}"
assert (20000, "bigphrase") in got
assert (20000, "neg") not in got
print(f"PASS wall={wall:.1f}s |matches|={len(got)} sample-verified={len(truth)}")
spark.stop()
