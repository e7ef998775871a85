"""Fresh-seed rank-identity soak: random synthetic corpora + random query
batches; index+WAND top-k must equal the join scorer doc-for-doc,
score-for-score. Also soaks _segment_topk_wand vs exhaustive on fresh rngs."""
import random, shutil, sys, tempfile, time
import numpy as np
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from elasticsearch_batch_percolator_spark.index.build import build_index
from elasticsearch_batch_percolator_spark.index.codec import encode_postings
from elasticsearch_batch_percolator_spark.operators.wand import (
    topk_from_index, _segment_topk_wand, _segment_topk_exhaustive, _idf)
from elasticsearch_batch_percolator_spark.operators.bm25 import bm25_topk
from elasticsearch_batch_percolator_spark.engine import Engine
from elasticsearch_batch_percolator_spark.session import get_spark
from pyspark.sql import functions as F

# part A: pure-python BMW property, fresh seeds
rng = np.random.default_rng(20260820)
for trial in range(200):
    n_terms = rng.integers(1, 6)
    term_blocks, idfs = {}, {}
    for t in range(n_terms):
        n_docs = int(rng.integers(1, 600))
        doc_ids = np.sort(rng.choice(8000, size=n_docs, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 20, n_docs).astype(np.int64)
        norms = rng.uniform(0.05, 2.2, n_docs)
        term_blocks[f"t{t}"] = encode_postings(doc_ids, tfs, norms, block=32)
        idfs[f"t{t}"] = _idf(8000, n_docs)
    for k in (1, 7, 100):
        a = _segment_topk_wand(term_blocks, idfs, k)
        b = _segment_topk_exhaustive(term_blocks, idfs, k)
        assert [d for d, _ in a] == [d for d, _ in b], f"trial={trial} k={k}"
        assert np.allclose([s for _, s in a], [s for _, s in b], atol=1e-12)
print("part A (200 fresh BMW trials): PASS", flush=True)

# part B: end-to-end Spark rank identity on fresh synthetic corpora
spark = get_spark("ebp-soak-wand", cores=16)
spark.sparkContext.setLogLevel("ERROR")
from elasticsearch_batch_percolator_spark.corpus import synth_corpus
from elasticsearch_batch_percolator_spark.functions.tokenizer import tokenize_code
base = random.Random(int(os.environ.get("META_SEED", "5151")))
t0 = time.time()
for it in range(4):
    seed = base.randrange(1 << 31)
    n = [20000, 50000, 30000, 12345][it]
    corpus = (synth_corpus(spark, n, partitions=32, seed=seed)
              if "seed" in synth_corpus.__code__.co_varnames else
              synth_corpus(spark, n, partitions=32))
    docs = corpus.select("doc_id", tokenize_code("content").alias("tokens")).persist()
    docs.count()
    idx = tempfile.mkdtemp(prefix="ebp_soak_idx_")
    build_index(spark, docs, idx, n_segments=[4, 16, 7, 1][it])
    # random query batch from the corpus vocabulary
    vocab = [r["term"] for r in docs.select(F.explode("tokens").alias("term"))
             .groupBy("term").count().orderBy(F.desc("count")).limit(400).collect()]
    qrng = random.Random(seed)
    queries = {f"q{i}": [qrng.choice(vocab) for _ in range(qrng.randint(1, 4))]
               for i in range(60)}
    for alg in ("wand", "exhaustive"):
        got = {(r["query_id"], r["rank"]): (int(r["doc_id"]), round(float(r["score"]), 9))
               for r in topk_from_index(spark, idx, queries, k=10, algorithm=alg).collect()}
        eng = Engine(spark, corpus, tokenizer="code")
        qdf = spark.createDataFrame([(q, t) for q, ts in queries.items() for t in ts],
                                    "query_id string, term string")
        exp = {(r["query_id"], r["rank"]): (int(r["doc_id"]), round(float(r["score"]), 9))
               for r in bm25_topk(eng.score(qdf), 10).collect()}
        assert set(got) == set(exp), f"it{it} {alg}: key sets differ"
        bad = [(k, got[k], exp[k]) for k in got
               if got[k][0] != exp[k][0] or abs(got[k][1] - exp[k][1]) > 1e-8]
        assert not bad, f"it{it} {alg}: {bad[:5]}"
    docs.unpersist(); shutil.rmtree(idx, ignore_errors=True)
    print(f"it{it} n={n} seed={seed}: rank-identical both algorithms [{time.time()-t0:.0f}s]", flush=True)
print("PASS")
spark.stop()
