"""(1) phrase_docs_from_index vs brute token-sequence scan, fresh corpora
with positions indexes; (2) search paging: concat of pages == one big page,
disjoint, correctly ordered."""
import random, shutil, sys, tempfile, time
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from elasticsearch_batch_percolator_spark.engine import Engine
from elasticsearch_batch_percolator_spark.index.build import build_index
from elasticsearch_batch_percolator_spark.operators.phrase_index import phrase_docs_from_index
from elasticsearch_batch_percolator_spark.operators.search import search
from elasticsearch_batch_percolator_spark.plans.compiler import compile_query
from elasticsearch_batch_percolator_spark.session import get_spark

spark = get_spark("ebp-soak-ph", cores=16)
spark.sparkContext.setLogLevel("ERROR")
base = random.Random(777)
t0 = time.time()
V = [f"w{i}" for i in range(40)]  # small vocab -> phrases actually occur
for it in range(3):
    seed = base.randrange(1 << 31)
    rng = random.Random(seed)
    rows = [(i, " ".join(rng.choices(V, k=rng.randint(2, 60)))) for i in range(8000)]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    eng = Engine(spark, df, tokenizer="ws")
    idx = tempfile.mkdtemp(prefix="ebp_soak_ph_")
    build_index(spark, eng.docs.select("doc_id", "tokens"), idx,
                n_segments=4, positions=True)
    # random phrases, some drawn from real docs (guaranteed hits)
    phrases = []
    for _ in range(12):
        if rng.random() < 0.5:
            src = rng.choice(rows)[1].split()
            if len(src) >= 3:
                st = rng.randrange(len(src) - 2)
                phrases.append(src[st:st + rng.randint(2, min(4, len(src) - st))])
                continue
        phrases.append([rng.choice(V) for _ in range(rng.randint(2, 4))])
    for ph in phrases:
        got = sorted(r["doc_id"] for r in phrase_docs_from_index(spark, idx, ph).collect())
        exp = sorted(i for i, c in rows
                     if any(c.split()[j:j+len(ph)] == ph for j in range(len(c.split()) - len(ph) + 1)))
        assert got == exp, f"seed {seed} phrase {ph}: {len(got)} vs {len(exp)}"
    # paging invariants on a scored query
    plan = compile_query({"bool": {"should": [{"term": {"content": rng.choice(V)}},
                                               {"term": {"content": rng.choice(V)}}]}})
    full = [(int(r["doc_id"]), float(r["score_r"])) for r in search(eng, plan, k=60, from_=0).collect()]
    pages = []
    for off in range(0, 60, 13):
        pages += [(int(r["doc_id"]), float(r["score_r"]))
                  for r in search(eng, plan, k=13, from_=off).collect()]
    assert pages[:len(full)] == full, f"seed {seed}: paging mismatch"
    assert len(set(d for d, _ in pages)) == len(pages)
    scores = [s for _, s in full]
    assert scores == sorted(scores, reverse=True)
    shutil.rmtree(idx, ignore_errors=True)
    print(f"it{it} seed={seed}: ok ({len(phrases)} phrases) [{time.time()-t0:.0f}s]", flush=True)
print("PASS")
spark.stop()
