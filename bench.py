"""Benchmark harness — driver runs this per round; prints ONE JSON line.

Headline numbers (BASELINE.json metric):
- index_build: tokenize + tf/df/dl statistics + posting materialization (files/sec)
- bm25 query throughput: a batch of top-k queries answered in one plan (queries/sec)

Scaling evidence for the north_rule's two-cluster-size criterion is produced
by scaling_bench.py (local[8] vs local[32]); this file is the per-round metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# deterministic query workload over the documents vocabulary
QUERY_TERMS = [
    ["spark"], ["spark", "join"], ["the", "fox"], ["vector", "window", "batch"],
    ["merge", "sort"], ["hash", "join", "group"], ["customer", "order"],
    ["stream", "batch"], ["filter", "query"], ["table", "scan", "merge"],
]


def main() -> None:
    from pyspark.sql import functions as F

    from elasticsearch_batch_percolator_spark.engine import Engine
    from elasticsearch_batch_percolator_spark.session import get_spark

    spark = get_spark("ebp-bench", cores=CPUS)
    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    eng = Engine.from_documents(spark, SF_DIR)
    n_docs, _ = eng.stats
    # force stats materialization (tokenize -> tf/dl/df), the index-build core
    eng.tf.count()
    eng.dfreq.count()
    timings["index_build"] = time.perf_counter() - t0

    # single-query top-k latency
    t0 = time.perf_counter()
    eng.topk(["spark", "join"], 10).collect()
    timings["bm25_single"] = time.perf_counter() - t0

    # batched multi-query throughput: 100 queries in ONE plan
    qrows = []
    for rep in range(10):
        for i, terms in enumerate(QUERY_TERMS):
            for t in terms:
                qrows.append((f"q{rep}_{i}", t))
    qdf = spark.createDataFrame(qrows, "query_id string, term string")
    t0 = time.perf_counter()
    eng.topk_many(qdf, 10).count()
    dt = time.perf_counter() - t0
    timings["bm25_batch100"] = dt
    n_queries = 100

    total = sum(timings.values())
    print(
        json.dumps(
            {
                "metric": "bm25_topk+index_build",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in timings.items()},
                "sf": SF_DIR,
                "n_docs": n_docs,
                "queries_per_sec": round(n_queries / dt, 2),
                "index_files_per_sec": round(n_docs / timings["index_build"], 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
