"""N->4N scaling evidence for segment compaction (maintenance job).

Builds ONE shared source index (800k base docs + 4 x 50k appended
micro-batches = 1M docs, 160 segments — the streaming-ingest shape), then
compacts it to 128 segments at two parallelism levels in SEPARATE
subprocesses (getOrCreate would silently reuse the first session's core
count in-process). Same input, same job, two cluster sizes; reports
docs/sec at both and the efficiency ratio, scaling_bench.py's protocol.

    SCALING_LO=2 SCALING_HI=8 python scaling_compact.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPS = int(os.environ.get("SCALING_REPS", "2"))


def run_inner(cores: int, src: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from elasticsearch_batch_percolator_spark.index.build import (
        compact_index, read_manifest,
    )
    from elasticsearch_batch_percolator_spark.session import get_spark

    spark = get_spark(f"compact_scaling_{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    n_docs = read_manifest(src).n_docs
    best = float("inf")
    runs = []
    for _ in range(REPS):
        dst = tempfile.mkdtemp(prefix=f"ebp_cs_{cores}_") + "/ix"
        t0 = time.perf_counter()
        m = compact_index(spark, src, dst, target_segments=128)
        el = time.perf_counter() - t0
        runs.append(round(el, 2))
        best = min(best, el)
        assert m.n_docs == n_docs
    print(json.dumps({
        "cores": cores, "runs": runs, "best_s": round(best, 2),
        "docs_per_sec": round(n_docs / best, 1),
    }))


def build_src(src: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from elasticsearch_batch_percolator_spark.corpus import synth_corpus
    from elasticsearch_batch_percolator_spark.functions.tokenizer import (
        tokenize_code,
    )
    from elasticsearch_batch_percolator_spark.index.build import (
        append_index, build_index,
    )
    from elasticsearch_batch_percolator_spark.session import get_spark

    spark = get_spark("compact_scaling_build", cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    def toks(df):
        return df.select("doc_id", tokenize_code("content").alias("tokens"))

    corpus = toks(synth_corpus(spark, 800_000, partitions=128)).persist()
    corpus.count()
    build_index(spark, corpus, src, n_segments=128)
    app = (
        toks(synth_corpus(spark, 200_000, partitions=32))
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
        .persist()
    )
    app.count()
    for i in range(4):
        append_index(
            spark, app.filter((F.col("doc_id") % 4) == i), src,
            n_new_segments=8,
        )
    spark.stop()


def main() -> None:
    lo = int(os.environ.get("SCALING_LO", "2"))
    hi = int(os.environ.get("SCALING_HI", "8"))
    src = tempfile.mkdtemp(prefix="ebp_cs_src_") + "/ix"
    subprocess.run(
        [sys.executable, __file__, "_build", src], check=True,
        stderr=subprocess.DEVNULL,
    )
    out = {}
    for cores in (lo, hi):
        r = subprocess.run(
            [sys.executable, __file__, "_level", str(cores), src],
            check=True, capture_output=True, text=True,
        )
        out[cores] = json.loads(r.stdout.strip().splitlines()[-1])
    eff = (out[hi]["docs_per_sec"] / out[lo]["docs_per_sec"]) / (hi / lo)
    print(json.dumps({
        "levels": out, "efficiency": round(eff, 3),
        "n_docs": 1_000_000, "segments": "160 -> 128",
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "_build":
        build_src(sys.argv[2])
    elif len(sys.argv) > 1 and sys.argv[1] == "_level":
        run_inner(int(sys.argv[2]), sys.argv[3])
    else:
        main()
