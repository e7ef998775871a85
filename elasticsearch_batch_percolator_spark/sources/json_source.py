"""Document sources: JSON batch bodies, NDJSON bulk, fetch-existing (S1-S4).

The reference ingests docs as XContent JSON: a ``{"docs":[...]}`` batch body
(BatchPercolatorService.parseRequest:277-325), a single ``{"doc":{...}}``
body with options (YPercolatorService.parseRequests:245-392), or an NDJSON
bulk stream of action/body pairs (MultiYPercolateRequest.add:56-129), plus
percolate-by-id which multi-GETs the stored doc and substitutes its source
(TransportYPercolateAction.doExecute:67-92).

Spark-first redesign notes:
- batch bodies parse with ``from_json`` + ``explode`` — one JVM-side pass;
- NDJSON here is one SELF-CONTAINED object per line
  ``{"action": "percolate"|"count", "slot": n, "doc": {...}}`` instead of
  the reference's stateful 2-line action/body pairing: pairing lines is
  inherently sequential and anti-parallel; carrying the slot in the line
  keeps bulk parsing embarrassingly parallel at any file split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.StringType()),
    ]
)

BATCH_BODY_SCHEMA = T.StructType([T.StructField("docs", T.ArrayType(DOC_SCHEMA))])

NDJSON_SCHEMA = T.StructType(
    [
        T.StructField("action", T.StringType()),
        T.StructField("slot", T.LongType()),
        T.StructField("doc", DOC_SCHEMA),
    ]
)


def parse_batch_body(bodies: DataFrame, body_col: str = "body") -> DataFrame:
    """S1: {"docs": [...]} JSON strings → (doc_id, content) rows."""
    return (
        bodies.select(F.from_json(F.col(body_col), BATCH_BODY_SCHEMA).alias("b"))
        .select(F.explode("b.docs").alias("d"))
        .select(F.col("d.doc_id").alias("doc_id"), F.col("d.content").alias("content"))
    )


def parse_single_body(bodies: DataFrame, body_col: str = "body") -> DataFrame:
    """S2: {"doc": {...}, "size": k, ...} → (doc_id, content, size)."""
    schema = T.StructType(
        [
            T.StructField("doc", DOC_SCHEMA),
            T.StructField("size", T.IntegerType()),
            T.StructField("track_scores", T.BooleanType()),
        ]
    )
    return bodies.select(F.from_json(F.col(body_col), schema).alias("b")).select(
        F.col("b.doc.doc_id").alias("doc_id"),
        F.col("b.doc.content").alias("content"),
        F.coalesce("b.size", F.lit(2**31 - 1)).alias("size"),
        F.coalesce("b.track_scores", F.lit(False)).alias("track_scores"),
    )


def parse_ndjson(spark: SparkSession, path_or_df) -> DataFrame:
    """S3: NDJSON bulk → (slot, action, doc_id, content, parse_error).

    A slot whose doc cannot be parsed is FLAGGED, not dropped — the
    reference answers such slots with a ``_parse_error_`` item while the
    sibling slots still percolate (YPercolatorService.java:214-218). A line
    so malformed that even its slot is unreadable surfaces as a
    null-slot error row (our self-contained-line NDJSON has no positional
    slot to recover, documented divergence)."""
    lines = (
        spark.read.text(path_or_df)
        if isinstance(path_or_df, str)
        else path_or_df
    )
    col = "value" if "value" in lines.columns else lines.columns[0]
    return (
        lines.filter(F.trim(F.col(col)) != "")
        .select(F.from_json(F.col(col), NDJSON_SCHEMA).alias("r"))
        .select(
            F.col("r.slot").alias("slot"),
            F.coalesce("r.action", F.lit("percolate")).alias("action"),
            F.col("r.doc.doc_id").alias("doc_id"),
            F.col("r.doc.content").alias("content"),
            (F.col("r").isNull() | F.col("r.doc").isNull()
             | F.col("r.doc.content").isNull() | F.col("r.slot").isNull()
             ).alias("parse_error"),
        )
    )


def fetch_existing(corpus: DataFrame, ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """S4: percolate docs already stored — semi-join ids against the corpus
    (the reference's multi-GET + source substitution)."""
    return corpus.join(ids.select(id_col), id_col, "left_semi")
