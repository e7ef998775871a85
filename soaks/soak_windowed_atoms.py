"""Pure atom-lane windowed soak: term/conjunction/long slop-0 phrase
(3-8 terms) registries through windowed_match_counts WITHOUT hybrid —
the n-gram atom streams must count exactly like a python model."""
import random, sys, time
import os; _R = os.path.dirname(os.path.dirname(os.path.abspath(__file__))); sys.path.insert(0, _R)
from pyspark.sql import functions as F
from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry
from elasticsearch_batch_percolator_spark.streaming.windowed import windowed_match_counts
from elasticsearch_batch_percolator_spark.session import get_spark

spark = get_spark("ebp-soak-wa", cores=8)
spark.sparkContext.setLogLevel("ERROR")
vocab = list("abcdef")
base = random.Random(int(os.environ.get("META_SEED", "26262")))
t0 = time.time()
for it in range(6):
    seed = base.randrange(1 << 63)
    rng = random.Random(seed)
    docs = []
    for i in range(300):
        toks = [rng.choice(vocab) for _ in range(rng.randint(2, 14))]
        docs.append((i, " ".join(toks), rng.randint(0, 29)))
    qs = {}
    for j in range(30):
        k = j % 3
        if k == 0:
            qs[f"q{j}"] = {"term": {"content": rng.choice(vocab)}}
        elif k == 1:
            qs[f"q{j}"] = {"bool": {"must": [
                {"term": {"content": rng.choice(vocab)}},
                {"term": {"content": rng.choice(vocab)}}]}}
        else:
            n = rng.randint(3, 8)
            qs[f"q{j}"] = {"phrase": {"field": "content",
                                      "terms": [rng.choice(vocab) for _ in range(n)]}}
    reg = CompiledRegistry.from_rows(list(qs.items()))
    df = spark.createDataFrame(
        [(i, c, f"2026-03-01 00:{m:02d}:30") for i, c, m in docs],
        "doc_id long, content string, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = windowed_match_counts(spark, df, reg, window_duration="10 minutes",
                                watermark=None, hybrid=False)
    got = {(r["window_start"].minute, r["query_id"]): r["n_docs"] for r in out.collect()}
    def m_q(qd, toks):
        if "term" in qd:
            return list(qd["term"].values())[0] in toks
        if "phrase" in qd:
            t = qd["phrase"]["terms"]
            return any(toks[i:i+len(t)] == t for i in range(len(toks)-len(t)+1))
        return all(m_q(c, toks) for c in qd["bool"]["must"])
    truth = {}
    for i, c, mnt in docs:
        toks = c.split()
        for qid, qd in qs.items():
            if m_q(qd, toks):
                key = (mnt // 10 * 10, qid)
                truth[key] = truth.get(key, 0) + 1
    assert got == truth, f"seed {seed}: diff {[(k, truth.get(k), got.get(k)) for k in (set(truth) | set(got)) if truth.get(k) != got.get(k)][:6]}"
    print(f"it{it} seed={seed}: ok |truth|={len(truth)} [{time.time()-t0:.0f}s]", flush=True)
print("PASS")
spark.stop()
