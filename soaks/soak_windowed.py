import random, sys, time
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from elasticsearch_batch_percolator_spark.plans.eval_py import eval_plan
from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry
from elasticsearch_batch_percolator_spark.streaming.windowed import windowed_match_counts
from elasticsearch_batch_percolator_spark.session import get_spark

spark = get_spark("ebp-soak-win", cores=16)
spark.sparkContext.setLogLevel("ERROR")
vocab = list("abcdefgh")
base = random.Random(int(os.environ.get("META_SEED", "7272")))
t0 = time.time(); fail = 0
for it in range(10):
    seed = base.randrange(1 << 63)
    rng = random.Random(seed)
    docs = []
    for i in range(250):
        toks = [rng.choice(vocab) for _ in range(rng.randint(1, 8))]
        docs.append((i, " ".join(toks), rng.randint(0, 29)))
    dups = [(i, c, m) for i, c, m in docs[: rng.randint(0, 50)]]
    qs = {}
    for j in range(36):
        kind = j % 6
        if kind == 0:
            qs[f"q{j}"] = {"term": {"content": rng.choice(vocab)}}
        elif kind == 1:
            qs[f"q{j}"] = {"bool": {"must": [
                {"term": {"content": rng.choice(vocab)}},
                {"term": {"content": rng.choice(vocab)}}],
                **({"should": [{"term": {"content": rng.choice(vocab)}},
                               {"term": {"content": rng.choice(vocab)}}],
                    "minimum_should_match": rng.randint(1, 2)} if rng.random() < 0.5 else {})}}
        elif kind == 2:
            qs[f"q{j}"] = {"bool": {"must_not": [
                {"term": {"content": rng.choice(vocab)}}]}}
        elif kind == 3:
            qs[f"q{j}"] = {"wildcard": {"content": rng.choice(vocab) + "*"}}
        elif kind == 4:
            qs[f"q{j}"] = {"span_near": {"clauses": [
                {"span_term": {"content": rng.choice(vocab)}},
                {"span_term": {"content": rng.choice(vocab)}}],
                "slop": rng.randint(0, 2), "in_order": rng.choice([True, False])}}
        else:
            qs[f"q{j}"] = {"phrase": {"field": "content",
                                      "terms": [rng.choice(vocab) for _ in range(rng.randint(2, 4))],
                                      "slop": rng.randint(0, 2)}}
    reg = CompiledRegistry.from_rows(list(qs.items()))
    df = spark.createDataFrame(
        [(i, c, f"2026-02-02 00:{m:02d}:30") for i, c, m in docs + dups],
        "doc_id long, content string, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = windowed_match_counts(spark, df, reg, window_duration="10 minutes",
                                watermark=None, hybrid=True)
    got = {(r["window_start"].minute, r["query_id"]): r["n_docs"] for r in out.collect()}
    truth = {}
    for i, c, m in docs:
        toks = c.split()
        for qid in qs:
            if eval_plan(reg.queries[qid].plan, {"content": toks}):
                key = (m // 10 * 10, qid)
                truth[key] = truth.get(key, 0) + 1
    ok = got == truth
    if not ok:
        fail += 1
        diff = {k: (truth.get(k), got.get(k)) for k in set(truth) ^ set(got) | {k for k in truth if truth[k] != got.get(k)}}
        print(f"seed {seed}: FAIL diff sample {dict(list(diff.items())[:6])}")
    print(f"it{it} seed {seed} dups={len(dups)}: {'ok' if ok else 'FAIL'} |truth|={len(truth)} [{time.time()-t0:.0f}s]", flush=True)
print("PASS" if fail == 0 else f"FAIL {fail}")
spark.stop()
