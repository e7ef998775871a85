"""index_stream split invariance + replay soak on fresh seeds:
same 10k docs pushed through apply_index_batch in K random splits with
random segments_per_batch/compact_at — term_stats and per-term retrieval
sets (docs containing the term) must be split-invariant and equal the
one-shot build; random batch replays must be no-ops."""
import random, shutil, sys, tempfile, time
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from elasticsearch_batch_percolator_spark.engine import Engine
from elasticsearch_batch_percolator_spark.index.build import build_index, read_term_stats
from elasticsearch_batch_percolator_spark.operators.wand import topk_from_index
from elasticsearch_batch_percolator_spark.streaming.index_stream import (
    apply_index_batch, current_index_dir)
from elasticsearch_batch_percolator_spark.session import get_spark

spark = get_spark("ebp-soak-is", cores=16)
spark.sparkContext.setLogLevel("ERROR")
base = random.Random(369)
t0 = time.time()
V = [f"t{i}" for i in range(400)]
rng0 = random.Random(42)
rows = [(i, " ".join(rng0.choices(V, k=rng0.randint(3, 30)))) for i in range(10000)]
probe = [rng0.choice(V) for _ in range(20)]

def tokdf(rs):
    df = spark.createDataFrame(rs, "doc_id long, content string")
    return Engine(spark, df, tokenizer="ws", cache=False).docs.select("doc_id", "tokens")

# one-shot reference
ref_idx = tempfile.mkdtemp(prefix="ebp_is_ref_")
build_index(spark, tokdf(rows), ref_idx, n_segments=6)
ref_stats = read_term_stats(spark, ref_idx, probe)
# retrieval sets via k larger than corpus: use term queries through topk? cheaper: tf from engine
eng = Engine(spark, spark.createDataFrame(rows, "doc_id long, content string"), tokenizer="ws")
ref_sets = {t: {r["doc_id"] for r in eng.tf.filter(F.col("term") == t).select("doc_id").collect()}
            for t in probe[:6]}

for it in range(3):
    seed = base.randrange(1 << 63)
    rng = random.Random(seed)
    root = tempfile.mkdtemp(prefix="ebp_is_root_")
    K = rng.randint(2, 6)
    cuts = sorted(rng.sample(range(1, 10000), K - 1)) + [10000]
    lo = 0; bid = 0
    spb = rng.choice([2, 4, 8]); cat = rng.choice([6, 10, None])
    for hi in cuts:
        bdf = tokdf(rows[lo:hi])
        apply_index_batch(spark, root, bdf, bid, segments_per_batch=spb,
                          compact_at=cat, target_segments=4)
        if rng.random() < 0.5:  # random replay of the SAME batch
            apply_index_batch(spark, root, bdf, bid, segments_per_batch=spb,
                              compact_at=cat, target_segments=4)
        lo = hi; bid += 1
    cur = current_index_dir(root)
    stats = read_term_stats(spark, cur, probe)
    assert stats == ref_stats, f"seed {seed}: term_stats diverged"
    for t, exp_set in ref_sets.items():
        got = {r["doc_id"] for r in
               topk_from_index(spark, cur, {"q": [t]}, k=len(exp_set) + 10).collect()}
        assert got == exp_set, f"seed {seed} term {t}: retrieval set diverged ({len(got)} vs {len(exp_set)})"
    shutil.rmtree(root, ignore_errors=True)
    print(f"it{it} seed={seed} K={K} spb={spb} compact_at={cat}: ok [{time.time()-t0:.0f}s]", flush=True)
shutil.rmtree(ref_idx, ignore_errors=True)
print("PASS")
spark.stop()
