"""Micro-batch boundary invariance: the same 3000 docs split into K random
rate-limited micro-batches through percolate_stream must produce EXACTLY
the one-shot batch percolate result, for random K and random registries."""
import glob, random, shutil, sys, tempfile, time
import os; _R = os.path.dirname(os.path.dirname(os.path.abspath(__file__))); sys.path.insert(0, _R); sys.path.insert(0, os.path.join(_R, "tests"))
import test_multi_field_random as M
from pyspark.sql import functions as F
from elasticsearch_batch_percolator_spark.operators.percolate import percolate
from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry
from elasticsearch_batch_percolator_spark.streaming.percolate_stream import percolate_stream
from elasticsearch_batch_percolator_spark.session import get_spark

spark = get_spark("ebp-soak-st", cores=8)
spark.sparkContext.setLogLevel("ERROR")
vocab = list("abcdefgh")
base = random.Random(int(os.environ.get("META_SEED", "646464")))
t0 = time.time()
for it in range(4):
    seed = base.randrange(1 << 63)
    rng = random.Random(seed)
    qs = {}
    for j in range(40):
        k = j % 4
        if k == 0: qs[f"q{j}"] = {"term": {"content": rng.choice(vocab)}}
        elif k == 1: qs[f"q{j}"] = {"bool": {"must": [{"term": {"content": rng.choice(vocab)}}],
                                              "must_not": [{"term": {"content": rng.choice(vocab)}}]}}
        elif k == 2: qs[f"q{j}"] = {"phrase": {"field": "content", "terms": [rng.choice(vocab), rng.choice(vocab)]}}
        else: qs[f"q{j}"] = {"wildcard": {"content": rng.choice(vocab) + "*"}}
    reg = CompiledRegistry.from_rows(list(qs.items()))
    docs = [(i, " ".join(rng.choices(vocab, k=rng.randint(1, 9)))) for i in range(3000)]

    # one-shot truth
    bdf = spark.createDataFrame(docs, "doc_id long, content string")
    res = percolate(spark, bdf, reg)
    truth = {(int(r["doc_id"]), r["query_id"]) for r in res.matches.collect()}
    res.unpersist()

    # write docs as K parquet files (one micro-batch each via maxFilesPerTrigger=1)
    src = tempfile.mkdtemp(prefix="ebp_st_src_")
    K = rng.randint(2, 6)
    cuts = sorted(rng.sample(range(1, 3000), K - 1)) + [3000]
    lo = 0
    for ci, hi in enumerate(cuts):
        spark.createDataFrame(docs[lo:hi], "doc_id long, content string") \
             .coalesce(1).write.parquet(f"{src}/part{ci}")
        lo = hi
    out = tempfile.mkdtemp(prefix="ebp_st_out_"); shutil.rmtree(out)
    ckp = tempfile.mkdtemp(prefix="ebp_st_ckp_"); shutil.rmtree(ckp)
    stream = (spark.readStream.schema("doc_id long, content string")
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/part*"))
    q = percolate_stream(spark, stream, reg, out, ckp)
    q.processAllAvailable(); q.stop()
    got = {(int(r["doc_id"]), r["query_id"])
           for r in spark.read.parquet(out).select("doc_id", "query_id").collect()}
    assert got == truth, (f"seed {seed} K={K}: missing={sorted(truth-got)[:6]} "
                          f"extra={sorted(got-truth)[:6]}")
    for d in (src, out, ckp):
        shutil.rmtree(d, ignore_errors=True)
    print(f"it{it} seed={seed} K={K}: ok |truth|={len(truth)} [{time.time()-t0:.0f}s]", flush=True)
print("PASS")
spark.stop()
