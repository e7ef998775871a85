"""dedup_keep_list soak: random corpora + CC-resolved clusters — the keep
list must retain exactly one doc (the min id) per cluster plus every
unclustered doc."""
import random, sys, time
import os; _R = os.path.dirname(os.path.dirname(os.path.abspath(__file__))); sys.path.insert(0, _R)
from elasticsearch_batch_percolator_spark.functions.dedup import (
    dedup_keep_list, resolve_duplicate_clusters)
from elasticsearch_batch_percolator_spark.session import get_spark

spark = get_spark("ebp-soak-kl", cores=8)
spark.sparkContext.setLogLevel("ERROR")
base = random.Random(55555)
t0 = time.time()
for it in range(4):
    seed = base.randrange(1 << 63)
    rng = random.Random(seed)
    n = 3000
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = {(a, b) if a < b else (b, a)
             for a, b in ((rng.randrange(n), rng.randrange(n)) for _ in range(800))
             if a != b}
    pairs = spark.createDataFrame(sorted(edges), "doc_a long, doc_b long")
    kl = dedup_keep_list(docs, pairs)
    keep = {r["doc_id"] for r in kl.filter("is_canonical = 1").collect()}
    # provenance: every non-survivor points at a kept canonical
    canon = {r["doc_id"]: r["canonical_id"] for r in kl.collect()}
    assert all(canon[c] == c for c in keep)
    # python model
    parent = {i: i for i in range(n)}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]; x = parent[x]
        return x
    for a, b in sorted(edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    exp = {i for i in range(n) if find(i) == i}
    assert keep == exp, (f"seed {seed}: |keep|={len(keep)} |exp|={len(exp)} "
                         f"diff={sorted(keep ^ exp)[:6]}")
    print(f"it{it} seed={seed}: ok kept {len(keep)}/{n} [{time.time()-t0:.0f}s]", flush=True)
print("PASS")
spark.stop()
