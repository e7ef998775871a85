"""Streaming percolation + multi-percolate slot semantics (E9, §2.6).

The reference's only streaming element is the real-time query-registration
listener (S5); document flow itself is batch-oriented ("batch big enough to
amortize" is its whole thesis, README.md:120-125). The Spark-native stream
path is Structured Streaming ``foreachBatch``: each micro-batch is one
percolation batch — exactly the RAMDirectory batching lesson, with the
compiled registry as the small broadcast state.

``multi_percolate`` reproduces the _mypercolate slot fan-out/fan-in
(TransportMultiYPercolateAction.ASyncAction:122-310): Spark's scheduler IS
the fan-out; per-slot results come back from one job via groupBy(slot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.percolate import percolate
from ..sources.registry import CompiledRegistry

_SLOT_SHIFT = 20  # up to ~1M slots per batch_id


def multi_percolate(
    spark: SparkSession,
    batches: DataFrame,
    registry: CompiledRegistry,
    content_col: str = "content",
    track_scores: bool = False,
    size: int | None = None,
    corpus: DataFrame | None = None,
    corpus_id_col: str = "doc_id",
    corpus_content_col: str = "content",
) -> DataFrame:
    """(batch_id, slot, action, content [, parse_error]) → per-slot results.

    Bulk-with-existing-docs (the reference's multi-get pre-resolution,
    TransportMultiYPercolateAction.java:79-116): when ``corpus`` is given
    and ``batches`` has a ``get_id`` column, slots with a non-null
    ``get_id`` resolve their content from the corpus in ONE join before
    fan-out (content_col on those slots may be null). A ``get_id`` absent
    from the corpus leaves the slot's content null, which flows into the
    per-slot ``_parse_error_`` channel — sibling slots are unaffected,
    exactly like an inline parse error.

    percolate-action slots get sorted matched query ids; count-action slots
    get only the count (E5). Every slot appears in the output, empty or not
    (the reference's per-slot reduce, :284-308). A slot flagged
    ``parse_error`` (or with NULL content/slot) is answered with
    ``error='_parse_error_'`` and zero matches while sibling slots
    percolate normally — the reference's per-slot error channel
    (YPercolatorService.java:214-218); healthy slots have ``error`` NULL.

    ``track_scores=True`` orders each slot's matches by BM25 score DESC
    (query_id tie-break — the only sort the reference allows, E4) and adds
    a parallel ``scores`` array; ``size`` truncates each slot's list (the
    S2 per-request size option; counts still reflect ALL matches, matching
    the reference where total is independent of page size).
    """
    if corpus is not None and "get_id" in batches.columns:
        # multi-get resolves exactly ONE doc per id — a corpus with
        # duplicate ids must not fan a slot out into duplicate result rows
        fetched = corpus.select(
            F.col(corpus_id_col).alias("get_id"),
            F.col(corpus_content_col).alias("_fetched"),
        ).dropDuplicates(["get_id"])
        batches = (
            batches.join(fetched, "get_id", "left")
            .withColumn(
                content_col, F.coalesce(F.col(content_col), F.col("_fetched"))
            )
            .drop("_fetched")
        )
    bad_flag = F.col(content_col).isNull() | F.col("slot").isNull()
    if "parse_error" in batches.columns:
        bad_flag = bad_flag | F.coalesce(F.col("parse_error"), F.lit(False))
    flagged = batches.withColumn("_bad", bad_flag)
    good = flagged.filter(~F.col("_bad"))
    # slot/batch_id bounds are enforced at pack time: an out-of-range slot
    # would silently collide with another (batch_id, slot) and merge
    # unrelated slots' matches — fail the job instead. Decode is pure
    # integer bit ops (no float division on the packed long).
    slot_ok = (F.col("slot") >= 0) & (F.col("slot") < F.lit(1 << _SLOT_SHIFT))
    batch_ok = (F.col("batch_id") >= 0) & (
        F.col("batch_id") < F.lit(1 << (62 - _SLOT_SHIFT))
    )
    keyed = good.withColumn(
        "doc_id",
        F.when(
            slot_ok & batch_ok,
            F.shiftleft(F.col("batch_id").cast("long"), _SLOT_SHIFT)
            + F.col("slot").cast("long"),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"multi_percolate: slot must be in [0, {1 << _SLOT_SHIFT}) "),
                    F.lit("and batch_id >= 0; got slot="),
                    F.col("slot").cast("string"),
                    F.lit(" batch_id="),
                    F.col("batch_id").cast("string"),
                )
            ).cast("long")
        ),
    )
    res = percolate(spark, keyed, registry, content_col=content_col)
    base_matches = (
        res.with_scores(registry).select("doc_id", "query_id", "score")
        if track_scores
        else res.matches.withColumn("score", F.lit(0.0))
    )
    matches = base_matches.withColumn(
        "batch_id", F.shiftright(F.col("doc_id"), _SLOT_SHIFT)
    ).withColumn(
        "slot", F.col("doc_id").bitwiseAND(F.lit((1 << _SLOT_SHIFT) - 1)).cast("long")
    )
    if track_scores:
        # score DESC, query_id ASC — sort the collected structs by the
        # negated score then id (E3/E4 per slot)
        ordered = F.transform(
            F.array_sort(
                F.collect_list(F.struct((-F.col("score")).alias("ns"), "query_id", "score"))
            ),
            lambda s: F.struct(s.getField("query_id"), s.getField("score")),
        )
        if size is not None:
            ordered = F.slice(ordered, 1, int(size))
        agg = matches.groupBy("batch_id", "slot").agg(
            ordered.alias("ranked"),
            F.count(F.lit(1)).cast("long").alias("n_matches"),
        ).select(
            "batch_id",
            "slot",
            F.transform("ranked", lambda s: s.getField("query_id")).alias(
                "matched_queries"
            ),
            F.transform("ranked", lambda s: s.getField("score")).alias("scores"),
            "n_matches",
        )
    else:
        agg = matches.groupBy("batch_id", "slot").agg(
            F.sort_array(F.collect_list("query_id")).alias("matched_queries"),
            F.count(F.lit(1)).cast("long").alias("n_matches"),
        )
        if size is not None:
            agg = agg.withColumn(
                "matched_queries", F.slice("matched_queries", 1, int(size))
            )
    base = flagged.select("batch_id", "slot", "action", "_bad").dropDuplicates(
        ["batch_id", "slot"]
    )
    cols = [
        "batch_id",
        "slot",
        "action",
        F.when(F.col("_bad"), F.lit(0).cast("long"))
        .otherwise(F.coalesce("n_matches", F.lit(0).cast("long")))
        .alias("n_matches"),
        F.when(
            F.col("_bad") | (F.col("action") == "count"),
            F.array().cast("array<string>"),
        )
        .otherwise(F.coalesce("matched_queries", F.array().cast("array<string>")))
        .alias("matched_queries"),
        F.when(F.col("_bad"), F.lit("_parse_error_")).alias("error"),
    ]
    if track_scores:
        cols.append(
            F.when(
                F.col("_bad") | (F.col("action") == "count"),
                F.array().cast("array<double>"),
            )
            .otherwise(F.coalesce("scores", F.array().cast("array<double>")))
            .alias("scores")
        )
    out = base.join(agg, ["batch_id", "slot"], "left").select(*cols)
    return out


def percolate_stream(
    spark: SparkSession,
    stream: DataFrame,
    registry: CompiledRegistry,
    out_path: str,
    checkpoint_path: str,
    content_col: str = "content",
    id_col: str = "doc_id",
    registry_path: str | None = None,
):
    """readStream → foreachBatch(percolate) → parquet sink.

    Returns the StreamingQuery; caller awaits/stops it. Registry updates
    take effect at micro-batch boundaries (S5's real-time listener analog):
    either mutate the shared registry object between batches, or pass
    ``registry_path`` — the durable queries table — and the stream RELOADS
    it before any micro-batch in which its files changed (mtime probe; the
    reference's RealTimePercolatorOperationListener keeps the in-memory map
    in step with the stored ~ypercolator docs the same way,
    BatchPercolatorQueriesRegistry.java:270-313).
    """
    state = {"reg": registry, "stamp": None}

    def _table_stamp() -> tuple | None:
        # Hadoop FileSystem listing (not os.scandir): the durable queries
        # table realistically lives on HDFS/S3, where a local scandir would
        # raise and silently disable reload. Works for file:// too.
        try:
            jvm = spark._jvm
            jpath = jvm.org.apache.hadoop.fs.Path(registry_path)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            entries = []
            for st in fs.listStatus(jpath):
                name = st.getPath().getName()
                if name.startswith("_") or name.startswith("."):
                    continue
                entries.append((name, st.getModificationTime(), st.getLen()))
            return tuple(sorted(entries))
        except Exception:
            return None

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if registry_path is not None:
            stamp = _table_stamp()
            if stamp is not None and stamp != state["stamp"]:
                from ..sources.registry import load_registry

                state["reg"] = load_registry(spark, registry_path)
                state["stamp"] = stamp
        res = percolate(
            spark, batch_df, state["reg"], content_col=content_col, id_col=id_col
        )
        (
            res.matches.withColumn("stream_batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_path)
        )
        res.unpersist()  # per-batch cleanup (E11)
        res.docs.unpersist()

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .start()
    )
