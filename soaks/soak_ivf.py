"""IVF ANN soak: fresh random corpora (clustered gaussians) —
(a) full-probe IVF == brute top-k exactly
(b) pruned probe recall@10 >= 0.8 with n_probe=3/8 on clustered data
(c) ivf_assign covers every vector exactly once"""
import random, sys, time
import numpy as np
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from elasticsearch_batch_percolator_spark.functions.similarity import (
    cosine_topk_brute, cosine_topk_ivf, ivf_assign, kmeans_fit)
from elasticsearch_batch_percolator_spark.session import get_spark

spark = get_spark("ebp-soak-ivf", cores=8)
spark.sparkContext.setLogLevel("ERROR")
base = random.Random(int(os.environ.get("META_SEED", "9090")))
t0 = time.time()
for it in range(4):
    seed = base.randrange(1 << 31)
    rng = np.random.default_rng(seed)
    dim, n_clusters, per = 24, 10, 600
    centers = rng.normal(size=(n_clusters, dim))
    rows = []
    vid = 0
    for c in range(n_clusters):
        pts = centers[c] + 0.15 * rng.normal(size=(per, dim))
        for p in pts:
            rows.append((vid, [float(x) for x in p])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").persist()
    df.count()
    cents = kmeans_fit(df, n=8, iters=4)
    assigned = ivf_assign(df, cents).persist()
    n_assigned = assigned.count()
    assert n_assigned == len(rows)
    assert assigned.select("vec_id").distinct().count() == len(rows)
    recalls = []
    for qi in range(8):
        q = [float(x) for x in (centers[qi % n_clusters] + 0.1 * rng.normal(size=dim))]
        brute = [r["vec_id"] for r in cosine_topk_brute(df, q, k=10).collect()]
        full = [r["vec_id"] for r in cosine_topk_ivf(spark, assigned, cents, q, k=10, n_probe=len(cents)).collect()]
        assert full == brute, f"seed {seed} q{qi}: full-probe != brute"
        pruned = [r["vec_id"] for r in cosine_topk_ivf(spark, assigned, cents, q, k=10, n_probe=3).collect()]
        recalls.append(len(set(pruned) & set(brute)) / 10)
    rec = sum(recalls) / len(recalls)
    assert rec >= 0.8, f"seed {seed}: recall {rec}"
    df.unpersist(); assigned.unpersist()
    print(f"it{it} seed={seed}: ok recall@10={rec:.2f} [{time.time()-t0:.0f}s]", flush=True)
print("PASS")
spark.stop()
