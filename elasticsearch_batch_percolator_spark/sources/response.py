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


def write_responses(per_doc: DataFrame, path: str, fmt: str = "json") -> None:
    """Persist the response set (the transport-layer reply analog)."""
    df = to_response_json(per_doc)
    df.write.mode("overwrite").format(fmt).save(path)
