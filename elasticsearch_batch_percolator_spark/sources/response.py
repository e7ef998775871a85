"""Response sink (S7): serialize per-doc percolation results to JSON.

The reference assembles ``{"results": [{"doc_id": ..., "matches":
[{"query_id": ..., "highlights": [...]}]}], "took": ms}`` via XContent
(YPercolateResponse.toXContent:65-75, QueryMatch.toXContent:88-107).
Here serialization is ``F.to_json`` over a struct column — JVM-side, no
Python — written by any DataFrame writer (parquet/json/console).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_response_json(
    per_doc: DataFrame,
    doc_col: str = "doc_id",
    matches_col: str = "matched_queries",
) -> DataFrame:
    """(doc_id, response_json) — one JSON object per document."""
    return per_doc.select(
        F.col(doc_col),
        F.to_json(
            F.struct(
                F.col(doc_col).alias("doc_id"),
                F.col(matches_col).alias("matches"),
                F.size(matches_col).alias("n_matches"),
            )
        ).alias("response_json"),
    )


def per_doc_responses(res, registry) -> DataFrame:
    """(doc_id, response_json) in the reference's FULL response item shape:
    ``{"doc_id": ..., "matches": [{"query_id": ..., "highlights":
    {field: [fragment, ...]}}, ...], "n_matches": N}`` — matches sorted by
    query_id, docs with no matches get an empty list
    (YPercolateResponseItem.toXContent:70-81, QueryMatch.toXContent:88-107,
    emptyPercolateResponses BatchPercolatorService.java:268-275).
    ``res`` is a PercolateResult; highlights honor each query's spec."""
    hl = res.with_highlights(registry)
    # explicit comparator: default struct ordering can't compare the
    # highlights MAP member, so sort on query_id alone
    agg = hl.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("query_id"), F.col("highlights"))),
            lambda a, b: F.when(a["query_id"] < b["query_id"], -1)
            .when(a["query_id"] > b["query_id"], 1)
            .otherwise(0)
            .cast("int"),
        ).alias("matches")
    )
    empty = F.array().cast(
        "array<struct<query_id: string, highlights: map<string, array<string>>>>"
    )
    shaped = (
        res.docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .withColumn("matches", F.coalesce("matches", empty))
    )
    return shaped.select(
        "doc_id",
        F.to_json(
            F.struct(
                F.col("doc_id"),
                F.col("matches"),
                F.size("matches").alias("n_matches"),
            )
        ).alias("response_json"),
    )


def write_responses(per_doc: DataFrame, path: str, fmt: str = "json") -> None:
    """Persist the response set (the transport-layer reply analog)."""
    df = to_response_json(per_doc)
    df.write.mode("overwrite").format(fmt).save(path)
