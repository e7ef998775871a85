import random, sys, time
import os; _R = os.path.dirname(os.path.dirname(os.path.abspath(__file__))); sys.path.insert(0, _R); sys.path.insert(0, os.path.join(_R, "tests"))
import test_limiting_bulk_random as L
from elasticsearch_batch_percolator_spark.plans.eval_py import eval_plan
from elasticsearch_batch_percolator_spark.plans.limiting import limiting_filter

FIELD = L.FIELD; VOCAB = L.VOCAB
base = random.Random(int(os.environ.get("META_SEED", "20260820")))
fails = 0
t0 = time.time()
for s in range(30):
    seed = base.randrange(1 << 63)
    rng = random.Random(seed)
    docs = [{FIELD: rng.choices(VOCAB, k=rng.randint(0, 12))} for _ in range(1000)]
    napp = 0
    for i in range(10_000):
        plan = L._random_plan(rng, depth=3)
        approx = limiting_filter(plan)
        if approx is None:
            continue
        napp += 1
        for doc in rng.sample(docs, 40):
            if eval_plan(plan, doc) and not eval_plan(approx, doc):
                fails += 1
                print(f"SEED {seed} tree#{i}: approximation excluded a true match\nplan={plan}\napprox={approx}\ndoc={doc}")
                if fails > 5: sys.exit(1)
    print(f"seed {seed}: ok ({napp} approximated) [{time.time()-t0:.0f}s]", flush=True)
print("PASS" if fails == 0 else f"FAIL {fails}")
