"""Inverted-index materialization: document-partitioned compressed segments.

Layout (the Spark-native answer to Lucene segments-per-shard; the reference
hash-routes queries across ES shards and broadcasts percolate requests,
TransportBatchPercolateAction.java:156-159 — document partitioning is the
same design):

    out_dir/postings/segment_id=K/*.parquet
        (term, df, cf, blocks array<struct<max_doc, max_norm, n,
         doc_bytes, tf_bytes, norm_bytes>>)   sorted by term within files
    out_dir/term_stats/*.parquet              (term, df, cf) global
    out_dir/manifest.json                     stats + lineage + per-segment
                                              metrics + completed set

Scale properties:
- segment_id = doc_id // seg_size → contiguous doc ranges per segment →
  small deltas, dense blocks, and NO global groupBy(term): the widest row a
  hot term ("def", "the") can produce is bounded by the segment size, which
  is the explicit skew handling the north_rule asks for (a term-partitioned
  layout would put 10^10 postings of "the" in one row/task at 10^12-file
  scale; a document-partitioned one never exceeds seg_size).
- the shuffle is ONE repartition by segment + in-partition sort by term
  (sort-merge shuffle); parquet min/max row-group stats on the sorted term
  column give term-lookup pruning at read time.
- resume: Spark dynamic partition overwrite rewrites only the segments
  being (re)built; completed segments are recorded in the manifest and
  skipped (north_rule checkpoint/resume; the reference's recovery analog is
  the registry reload, BatchPercolatorQueriesRegistry.java:244-266).
- norms are precomputed at build (avgdl frozen in the manifest), so query
  scoring never touches doc lengths.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import asdict, dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import BM25_B, BM25_K1
from .codec import BLOCK, encode_postings

BLOCKS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("max_doc", T.LongType()),
            T.StructField("max_norm", T.DoubleType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("doc_bytes", T.BinaryType()),
            T.StructField("tf_bytes", T.BinaryType()),
            T.StructField("norm_bytes", T.BinaryType()),
        ]
    )
)


@dataclass
class IndexManifest:
    n_docs: int
    avgdl: float
    n_segments: int
    seg_size: int
    block: int = BLOCK
    k1: float = BM25_K1
    b: float = BM25_B
    tokenizer: str = "ws"
    input_lineage: str = ""
    completed: dict = field(default_factory=dict)  # seg_id(str) -> metrics

    def save(self, out_dir: str) -> None:
        tmp = os.path.join(out_dir, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(asdict(self), f, indent=1)
        os.replace(tmp, os.path.join(out_dir, "manifest.json"))


def read_manifest(out_dir: str) -> IndexManifest | None:
    p = os.path.join(out_dir, "manifest.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return IndexManifest(**json.load(f))


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    n_segments: int = 8,
    block: int = BLOCK,
    resume: bool = True,
    lineage: str = "",
    fail_after_segments: int | None = None,
) -> IndexManifest:
    """Build (or resume) the compressed inverted index for ``docs``
    (doc_id long, tokens array<string>).

    ``fail_after_segments`` is a test hook: abort after materializing that
    many segments to exercise the resume path.
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest = read_manifest(out_dir) if resume else None
    t_start = time.perf_counter()

    if manifest is None:
        row = docs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size("tokens")).alias("total_dl"),
            F.max("doc_id").alias("max_doc"),
        ).first()
        n_docs = int(row["n"])
        avgdl = float(row["total_dl"]) / n_docs if n_docs else 0.0
        seg_size = max(1, math.ceil((int(row["max_doc"]) + 1) / n_segments))
        manifest = IndexManifest(
            n_docs=n_docs,
            avgdl=avgdl,
            n_segments=n_segments,
            seg_size=seg_size,
            block=block,
            input_lineage=lineage,
        )
        manifest.save(out_dir)
    # frozen stats from the manifest — a resume MUST score identically
    avgdl, seg_size, n_segments = manifest.avgdl, manifest.seg_size, manifest.n_segments
    k1, b = manifest.k1, manifest.b

    missing = [s for s in range(n_segments) if str(s) not in manifest.completed]
    if fail_after_segments is not None:
        missing = missing[:fail_after_segments]
    if missing:
        seg_col = F.least(
            (F.col("doc_id") / F.lit(seg_size)).cast("int"), F.lit(n_segments - 1)
        )
        base = (
            docs.withColumn("segment_id", seg_col)
            .filter(F.col("segment_id").isin(missing))
            .withColumn("dl", F.size("tokens").cast("long"))
            .select("segment_id", "doc_id", "dl", F.explode("tokens").alias("term"))
        )
        tf = base.groupBy("segment_id", "term", "doc_id", "dl").agg(
            F.count(F.lit(1)).alias("tf")
        )
        # BM25 tf-norm precomputed JVM-side (whole-stage codegen)
        norm = (F.col("tf") * (k1 + 1.0)) / (
            F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
        )
        plists = (
            tf.withColumn("norm", norm)
            .groupBy("segment_id", "term")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("doc_id", "tf", "norm"))
                ).alias("plist"),
                F.count(F.lit(1)).cast("long").alias("df"),
                F.sum("tf").cast("long").alias("cf"),
            )
        )

        @F.pandas_udf(BLOCKS_TYPE)
        def encode(plist: pd.Series) -> pd.Series:
            out = []
            for postings in plist:
                doc_ids = np.fromiter((p["doc_id"] for p in postings), dtype=np.int64)
                tfs = np.fromiter((p["tf"] for p in postings), dtype=np.int64)
                norms = np.fromiter((p["norm"] for p in postings), dtype=np.float64)
                out.append(encode_postings(doc_ids, tfs, norms, block=block))
            return pd.Series(out)

        result = (
            plists.withColumn("blocks", encode(F.col("plist")))
            .select("segment_id", "term", "df", "cf", "blocks")
            .repartition("segment_id")
            .sortWithinPartitions("term")
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        result.write.partitionBy("segment_id").mode("overwrite").parquet(
            os.path.join(out_dir, "postings")
        )

        # per-segment metrics (rows/terms/postings) from the written files
        written = spark.read.parquet(os.path.join(out_dir, "postings")).filter(
            F.col("segment_id").isin(missing)
        )
        metrics = {
            str(r["segment_id"]): {
                "terms": int(r["terms"]),
                "postings": int(r["postings"]),
                "built_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            for r in written.groupBy("segment_id")
            .agg(F.count(F.lit(1)).alias("terms"), F.sum("df").alias("postings"))
            .collect()
        }
        elapsed = time.perf_counter() - t_start
        for s in missing:
            m = metrics.get(str(s), {"terms": 0, "postings": 0})
            m["wall_clock_share_s"] = round(elapsed / len(missing), 3)
            manifest.completed[str(s)] = m
        manifest.save(out_dir)

    if len(manifest.completed) == n_segments:
        _finalize_term_stats(spark, out_dir)
    return manifest


def _finalize_term_stats(spark: SparkSession, out_dir: str) -> None:
    """Global (term, df, cf) — a light column scan over all segments."""
    stats_path = os.path.join(out_dir, "term_stats")
    (
        spark.read.parquet(os.path.join(out_dir, "postings"))
        .groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"), F.sum("cf").cast("long").alias("cf"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(stats_path)
    )


def read_postings(spark: SparkSession, out_dir: str, terms: list[str]) -> DataFrame:
    """Query-side segment scan with term pushdown (parquet row-group pruning
    works because files are sorted by term)."""
    return (
        spark.read.parquet(os.path.join(out_dir, "postings"))
        .filter(F.col("term").isin(terms))
    )


def read_term_stats(spark: SparkSession, out_dir: str, terms: list[str]) -> dict[str, int]:
    rows = (
        spark.read.parquet(os.path.join(out_dir, "term_stats"))
        .filter(F.col("term").isin(terms))
        .collect()
    )
    return {r["term"]: int(r["df"]) for r in rows}
