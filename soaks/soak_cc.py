"""resolve_duplicate_clusters soak: random graphs (chains, stars, cliques,
random G(n,p), isolated pairs) vs an independent python union-find."""
import random, sys, time
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from elasticsearch_batch_percolator_spark.functions.dedup import resolve_duplicate_clusters
from elasticsearch_batch_percolator_spark.session import get_spark

def uf_components(edges, ids):
    parent = {i: i for i in ids}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}

spark = get_spark("ebp-soak-cc", cores=16)
spark.sparkContext.setLogLevel("ERROR")
base = random.Random(424242)
t0 = time.time()
for it in range(8):
    seed = base.randrange(1 << 63)
    rng = random.Random(seed)
    shape = it % 4
    edges = set()
    if shape == 0:  # long chain + noise (pointer-jump stressor)
        n = 3000
        edges |= {(i, i + 1) for i in range(n - 1)}
        edges |= {(rng.randrange(n), rng.randrange(n)) for _ in range(50)}
    elif shape == 1:  # stars + cliques
        for s in range(30):
            c = rng.randrange(1 << 40)
            edges |= {(c, c + j + 1) for j in range(rng.randint(1, 40))}
        for _ in range(5):
            ids = [rng.randrange(1 << 40) for _ in range(8)]
            edges |= {(a, b) for a in ids for b in ids if a < b}
    elif shape == 2:  # sparse G(n,p)
        n = 5000
        edges |= {(rng.randrange(n), rng.randrange(n)) for _ in range(4000)}
    else:  # many isolated pairs, huge 64-bit-ish ids
        edges |= {(x := rng.randrange(1 << 55), x + rng.randint(1, 9)) for _ in range(2000)}
    edges = {(a, b) for a, b in edges if a != b}
    ids = sorted({x for e in edges for x in e})
    pdf = spark.createDataFrame(sorted(edges), "doc_a long, doc_b long")
    got = {r["doc_id"]: r["canonical_id"] for r in resolve_duplicate_clusters(pdf).collect()}
    exp = uf_components(sorted(edges), ids)
    assert set(got) == set(exp), f"seed {seed}: id sets differ"
    bad = [(i, got[i], exp[i]) for i in exp if got[i] != exp[i]]
    assert not bad, f"seed {seed} shape {shape}: {bad[:5]}"
    print(f"it{it} shape={shape} seed={seed}: ok |V|={len(ids)} |E|={len(edges)} "
          f"comps={len(set(exp.values()))} [{time.time()-t0:.0f}s]", flush=True)
print("PASS")
spark.stop()
