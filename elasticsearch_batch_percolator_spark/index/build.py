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
            T.StructField("pos_bytes", T.BinaryType()),
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
    positions: bool = False,
) -> IndexManifest:
    """Build (or resume) the compressed inverted index for ``docs``
    (doc_id long, tokens array<string>).

    ``fail_after_segments`` is a test hook: abort after materializing that
    many segments to exercise the resume path.

    ``positions=True`` stores within-doc token positions per posting
    (delta+varint) — needed only when registered queries include phrases/
    spans that should run index-side (SURVEY.md §7 hard part 2: keep
    positions only where a query needs them; they dominate index size).
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
        missing_set = set(missing)

        # pass 1 (map-only, embarrassingly parallel): per-doc term frequency
        # via np.unique — replaces explode + groupBy(doc, term), i.e. one
        # whole shuffle of |tokens| rows disappears
        def count_tf(batches):
            for pdf in batches:
                segs, terms, docs_, tfs, dls, poss = [], [], [], [], [], []
                for d, s, toks in zip(
                    pdf["doc_id"].to_numpy(),
                    pdf["segment_id"].to_numpy(),
                    pdf["tokens"],
                ):
                    if s not in missing_set:
                        continue
                    arr = np.asarray(toks)
                    dl = len(arr)
                    if dl == 0:
                        continue
                    if positions:
                        order = np.argsort(arr, kind="stable")
                        srt = arr[order]
                        bnd = np.flatnonzero(srt[1:] != srt[:-1]) + 1
                        starts = np.concatenate([[0], bnd])
                        ends = np.concatenate([bnd, [dl]])
                        u = srt[starts]
                        c = (ends - starts).astype(np.int64)
                        poss.extend(
                            order[s0:e0].astype(np.int32) for s0, e0 in zip(starts, ends)
                        )
                    else:
                        u, c = np.unique(arr, return_counts=True)
                    terms.append(u)
                    tfs.append(c)
                    docs_.append(np.full(len(u), d, dtype=np.int64))
                    segs.append(np.full(len(u), s, dtype=np.int32))
                    dls.append(np.full(len(u), dl, dtype=np.int64))
                if not terms:
                    continue
                out = {
                    "segment_id": np.concatenate(segs),
                    "term": np.concatenate(terms),
                    "doc_id": np.concatenate(docs_),
                    "tf": np.concatenate(tfs),
                    "dl": np.concatenate(dls),
                }
                if positions:
                    out["positions"] = poss
                yield pd.DataFrame(out)

        tf_schema = "segment_id int, term string, doc_id long, tf long, dl long"
        if positions:
            tf_schema += ", positions array<int>"
        tf_rows = (
            docs.withColumn("segment_id", seg_col)
            .filter(F.col("segment_id").isin(missing))
            .select("segment_id", "doc_id", "tokens")
            .mapInPandas(count_tf, tf_schema)
        )

        # pass 2: THE sort-merge shuffle (north_rule): one exchange by
        # segment, in-partition sort by (term, doc_id), then a streaming
        # run-grouping encoder over sorted Arrow batches
        sorted_rows = tf_rows.repartition("segment_id").sortWithinPartitions(
            "segment_id", "term", "doc_id"
        )

        out_schema = T.StructType(
            [
                T.StructField("segment_id", T.IntegerType()),
                T.StructField("term", T.StringType()),
                T.StructField("df", T.LongType()),
                T.StructField("cf", T.LongType()),
                T.StructField("blocks", BLOCKS_TYPE),
            ]
        )

        def encode_stream(batches):
            carry = None  # (seg, term, docs, tfs, norms) of the unfinished run

            def emit(groups):
                return pd.DataFrame(
                    {
                        "segment_id": [g[0] for g in groups],
                        "term": [g[1] for g in groups],
                        "df": [len(g[2]) for g in groups],
                        "cf": [int(g[3].sum()) for g in groups],
                        "blocks": [
                            encode_postings(
                                g[2], g[3], g[4], block=block, positions_flat=g[5]
                            )
                            for g in groups
                        ],
                    }
                )

            for pdf in batches:
                seg = pdf["segment_id"].to_numpy()
                term = pdf["term"].to_numpy(dtype=object)
                doc = pdf["doc_id"].to_numpy()
                tf = pdf["tf"].to_numpy()
                dl = pdf["dl"].to_numpy()
                if positions:
                    pos_flat = np.concatenate(
                        [np.asarray(x, dtype=np.int64) for x in pdf["positions"]]
                    )
                    pos_bounds = np.concatenate([[0], np.cumsum(tf)]).astype(np.int64)
                else:
                    pos_flat = pos_bounds = None
                norm = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
                # run boundaries of (segment, term) over the sorted stream
                change = np.flatnonzero(
                    (seg[1:] != seg[:-1]) | (term[1:] != term[:-1])
                )
                starts = np.concatenate([[0], change + 1])
                ends = np.concatenate([change + 1, [len(seg)]])
                groups = []
                for s, e in zip(starts, ends):
                    gpos = (
                        pos_flat[pos_bounds[s] : pos_bounds[e]]
                        if positions
                        else None
                    )
                    g = (seg[s], term[s], doc[s:e], tf[s:e], norm[s:e], gpos)
                    if carry is not None:
                        if carry[0] == g[0] and carry[1] == g[1]:
                            g = (
                                g[0],
                                g[1],
                                np.concatenate([carry[2], g[2]]),
                                np.concatenate([carry[3], g[3]]),
                                np.concatenate([carry[4], g[4]]),
                                np.concatenate([carry[5], g[5]]) if positions else None,
                            )
                        else:
                            groups.append(carry)
                        carry = None
                    groups.append(g)
                if groups:
                    carry = groups.pop()  # last run may continue next batch
                if groups:
                    yield emit(groups)
            if carry is not None:
                yield emit([carry])

        result = sorted_rows.mapInPandas(encode_stream, out_schema)
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
