"""SRP-LSH embedding near-dup soak: plant pairs at cosine ~0.93-0.99 in
noise; srp_lsh_candidates -> cosine_neardup_pairs must recover >=0.9 of
planted pairs at threshold 0.9; gated sims equal the exact path on the
recovered pairs."""
import random, sys, time
import numpy as np
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from elasticsearch_batch_percolator_spark.functions.similarity import (
    cosine_neardup_pairs, srp_lsh_candidates)
from elasticsearch_batch_percolator_spark.session import get_spark

spark = get_spark("ebp-soak-srp", cores=8)
spark.sparkContext.setLogLevel("ERROR")
base = random.Random(int(os.environ.get("META_SEED", "808")))
t0 = time.time()
for it in range(4):
    seed = base.randrange(1 << 31)
    rng = np.random.default_rng(seed)
    dim = 32
    rows, planted = [], []
    vid = 0
    for p in range(50):
        a = rng.normal(size=dim)
        b = a + 0.22 * rng.normal(size=dim)   # cosine ~0.92-0.99
        ca = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        rows.append((vid, [float(x) for x in a]))
        rows.append((vid + 1, [float(x) for x in b]))
        if ca >= 0.93:
            planted.append((vid, vid + 1))
        vid += 2
    for _ in range(600):
        rows.append((vid, [float(x) for x in rng.normal(size=dim)])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cand = srp_lsh_candidates(df, n_bits=16, n_bands=4, seed=7)
    nd = {(r["vec_a"], r["vec_b"]): r["sim_r"]
          for r in cosine_neardup_pairs(df, 0.9, pairs=cand).collect()}
    hits = sum(1 for p in planted if p in nd)
    recall = hits / len(planted)
    # exact oracle on planted pairs
    vecs = dict(rows)
    for (a, b) in planted:
        if (a, b) in nd:
            va, vb = np.array(vecs[a]), np.array(vecs[b])
            exact = round(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 6)
            assert abs(nd[(a, b)] - exact) < 1e-9, f"seed {seed}: sim mismatch"
    assert recall >= 0.9, f"seed {seed}: recall {recall} ({hits}/{len(planted)})"
    print(f"it{it} seed={seed}: ok recall={recall:.2f} planted={len(planted)} [{time.time()-t0:.0f}s]", flush=True)
print("PASS")
spark.stop()
