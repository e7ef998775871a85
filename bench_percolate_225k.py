"""Reference-scale percolation benchmark: 225,000 registered queries.

The reference's headline anecdote is ~1,000 docs/s at 225k registered
queries (README.md:10-12, hardware unspecified, "differs greatly depending
on the nature of your queries"). This reproduces that workload shape:
selective multi-term MUST / phrase / wildcard-phrase / must_not queries
drawn from the Zipf tail of a 10,000-term vocabulary (realistic term
selectivity — a tiny vocabulary makes every query unrealistically dense),
percolated against a 20k-doc batch.

Measured on local[32]: round 1 — 27.4s warm = ~730 docs/s; round 2 —
14.1-19.3s warm across runs = ~1,038-1,417 docs/s (cached verify-plan
broadcast + simple-MUST fast lane + persisted batch terms; this box's
run-to-run variance is ±25%). Query compile (~7-10s for all 225k) is
registration-time, amortized across all future batches exactly like the
reference's parse.

    python bench_percolate_225k.py [n_queries] [n_docs]
"""

import sys, time, os, random
import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/ebp-spark")
os.environ.setdefault("EBP_IO_CODEC", "lz4")  # tmpfs shuffle on the bench box
from elasticsearch_batch_percolator_spark.session import get_spark
from elasticsearch_batch_percolator_spark.corpus import synth_corpus, _full_vocab
VOCAB = list(_full_vocab(10000))
from elasticsearch_batch_percolator_spark.operators.percolate import percolate
from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry

N_QUERIES = int(sys.argv[1]) if len(sys.argv) > 1 else 225_000
N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

rng = random.Random(42)
rows = []
for i in range(N_QUERIES):
    TAIL = VOCAB[len(VOCAB)//3:]   # Zipf tail -> realistic selectivity
    kind = i % 10
    if kind < 6:   # selective multi-term MUST
        terms = rng.sample(TAIL, rng.randint(3, 5))
        q = {"bool": {"must": [{"term": {"content": t}} for t in terms]}}
    elif kind < 8:
        q = {"phrase": {"field": "content", "terms": rng.sample(TAIL, 2)}}
    elif kind < 9:
        terms = rng.sample(TAIL, 4)
        q = {"bool": {"must": [{"term": {"content": t}} for t in terms[:3]],
                       "must_not": [{"term": {"content": terms[3]}}]}}
    else:
        terms = rng.sample(TAIL, 4)
        q = {"wildcard_phrase": {"field": "content", "producers": [
            {"term": {"content": terms[0]}}, {"wildcard": {"content": terms[1][:4] + "*"}}]}}
    rows.append((f"q{i}", q))

spark = get_spark('p225k', cores=32)

# recovery-scale registration: distributed blob compile (default) —
# executors parse + approximate + pickle the plan trees; the driver
# assembles metadata and never unpickles a plan (the verify broadcast
# forwards the worker bytes). EBP_REG_MODE=driver restores the serial
# driver-side compile for A/B.
t0 = time.perf_counter()
if os.environ.get("EBP_REG_MODE", "dist") == "driver":
    reg = CompiledRegistry.from_rows(rows)
    mode = "driver"
else:
    import json as _json
    import pandas as _pd
    qpdf = _pd.DataFrame(
        {"query_id": [qid for qid, _ in rows],
         "query_json": [_json.dumps(qj) for _, qj in rows]}
    )
    # no repartition: Arrow createDataFrame already slices the pandas
    # frame into `defaultParallelism` (=cores) partitions, so adding a
    # repartition(64) only inserts a full shuffle of the query JSON in
    # front of the compile (measured +~1.5s at 225k, zero task-balance
    # benefit — tasks are ~0.2s each either way)
    qdf = spark.createDataFrame(qpdf)
    reg = CompiledRegistry.from_df(qdf, distributed=True)
    mode = "distributed blob"
t_compile = time.perf_counter() - t0
print(f"compiled {len(reg)} queries ({mode}) in {t_compile:.1f}s; "
      f"gate-verify ids: {len(reg.gate_verify_ids())}")
# registration-time warmup: build + ship the verify-plan broadcast now,
# the way the reference pays its query parse at registration
# (BatchPercolatorQueriesRegistry.java:244-266), so per-batch times
# measure percolation, not registration amortization
t0 = time.perf_counter()
# sample-exercised warmup: term stats for gate choice + jv lane decision
# come from a small representative sample (the reference's analog reads
# stats from its live index at registration), and one tiny percolation
# spawns python workers / ships the verify broadcast / compiles codegen —
# so the FIRST production batch runs at steady state
# >= cores partitions so the exercise spawns EVERY python worker (each
# pays its one-time broadcast unpickle here, not in the first real batch)
warm_sample = synth_corpus(spark, 6000, partitions=128, vocab_size=10000)
reg.warmup(spark, sample=warm_sample)
print(f"registration warmup (broadcast + jv structs + sample exercise) in {time.perf_counter() - t0:.1f}s")
# one FRESH pre-materialized batch per rep: re-percolating the same
# DataFrame lets Spark reuse shuffle map outputs across reps (no
# production micro-batch gets that), so rep0 is the first production
# batch and later reps are steady state on data Spark has never seen
N_REPS = int(os.environ.get("P225K_REPS", "3"))
batches = []
for rep in range(N_REPS):
    b = synth_corpus(spark, N_DOCS, partitions=128, vocab_size=10000).cache()
    b.count()
    batches.append(b)
for rep, b in enumerate(batches):
    t0 = time.perf_counter()
    res = percolate(spark, b, reg)
    n = res.matches.count()
    dt = time.perf_counter() - t0
    res.unpersist()
    print(f"rep{rep}: {N_DOCS} docs x {N_QUERIES} queries -> {n} matches in {dt:.1f}s = {N_DOCS/dt:.0f} docs/s")
spark.stop()
