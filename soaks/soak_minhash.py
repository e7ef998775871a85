"""MinHash-LSH planted-dup recall soak: plant near-identical pairs at
~0.85-0.95 shingle-jaccard among unrelated docs; candidates must recover
>=90% of planted pairs (16 hashes / 4 bands => ~s^4 per band, ~1-(1-s^4)^4
overall: 0.97 at s=0.9) and never emit a FALSE pair above trivial rates.
Also: ngram_jaccard_pairs exactness vs python jaccard on the candidates."""
import random, sys, time
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from elasticsearch_batch_percolator_spark.functions.dedup import (
    minhash_lsh_candidates, ngram_jaccard_pairs)
from elasticsearch_batch_percolator_spark.session import get_spark

spark = get_spark("ebp-soak-mh", cores=8)
spark.sparkContext.setLogLevel("ERROR")
base = random.Random(int(os.environ.get("META_SEED", "121212")))
t0 = time.time()

def sh3(toks):
    return {tuple(toks[i:i+3]) for i in range(len(toks) - 2)}

for it in range(4):
    seed = base.randrange(1 << 63)
    rng = random.Random(seed)
    vocab = [f"v{i}" for i in range(5000)]
    rows, planted = [], []
    vid = 0
    for p in range(60):
        n = rng.randint(40, 120)
        a = rng.choices(vocab, k=n)
        b = list(a)
        for _ in range(max(1, n // 25)):      # ~4% token edits
            b[rng.randrange(n)] = rng.choice(vocab)
        ja = len(sh3(a) & sh3(b)) / max(1, len(sh3(a) | sh3(b)))
        rows.append((vid, a)); rows.append((vid + 1, b))
        if ja >= 0.8:
            planted.append((vid, vid + 1, ja))
        vid += 2
    for _ in range(800):                       # unrelated noise docs
        rows.append((vid, rng.choices(vocab, k=rng.randint(10, 80)))); vid += 1
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    cand = {(r["doc_a"], r["doc_b"])
            for r in minhash_lsh_candidates(df, n_hashes=16, n_bands=4).collect()}
    hits = sum(1 for a, b, _ in planted if (a, b) in cand)
    recall = hits / len(planted)
    toks = dict(rows)
    false_high = [(a, b) for a, b in cand
                  if len(sh3(toks[a]) & sh3(toks[b])) == 0]
    assert recall >= 0.9, f"seed {seed}: recall {recall} ({hits}/{len(planted)})"
    assert len(false_high) == 0, f"seed {seed}: {len(false_high)} zero-overlap candidate pairs"
    # jaccard exactness on the LSH-gated pairs
    jp = {(r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
          for r in ngram_jaccard_pairs(df, shingle_n=3).collect()}
    for (a, b), jv in list(jp.items())[:200]:
        exp = len(sh3(toks[a]) & sh3(toks[b])) / len(sh3(toks[a]) | sh3(toks[b]))
        assert abs(jv - exp) < 1e-9, f"seed {seed} ({a},{b}): {jv} vs {exp}"
    print(f"it{it} seed={seed}: ok recall={recall:.2f} |cand|={len(cand)} |planted|={len(planted)} [{time.time()-t0:.0f}s]", flush=True)
print("PASS")
spark.stop()
