"""Corpus source: the Iceberg-style table of source-code repositories.

input_hint: ``(repo string, path string, commit string, lang string,
content string)``. In production the table is an Iceberg table addressed by
catalog name; this container has no Iceberg runtime, so the loader accepts
either a catalog table name (``spark.read.table`` — works unchanged for
Iceberg/Delta/Hive when the runtime jars + catalog config are present) or a
parquet directory path. Column set is validated either way; ``doc_id``
(stable dense id) and ``content_sha256`` (the per-row invariant vs the
reference corpus, input_hint) are derived on load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def read_corpus(
    spark: SparkSession,
    source: str,
    with_ids: bool = True,
    verify_sha_against: DataFrame | None = None,
) -> DataFrame:
    """Load the corpus table from a catalog table name or a parquet path."""
    if "/" in source or source.endswith(".parquet"):
        df = spark.read.parquet(source)
    else:
        df = spark.read.table(source)
    missing = [c for c in CORPUS_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"corpus source {source!r} is missing columns {missing}")
    out = df.select(*(["doc_id"] if "doc_id" in df.columns else []), *CORPUS_COLUMNS)
    if "doc_id" not in out.columns and with_ids:
        from ..corpus import with_doc_ids

        out = with_doc_ids(out)
    out = out.withColumn("content_sha256", F.sha2(F.col("content"), 256))
    if verify_sha_against is not None:
        mismatches = verify_sha_check(out, verify_sha_against)
        n = mismatches.limit(1).count()
        if n:
            raise ValueError("content sha256 mismatch vs reference corpus")
    return out


def verify_sha_check(corpus: DataFrame, reference: DataFrame) -> DataFrame:
    """Rows whose content hash disagrees with the reference corpus
    (join on identity columns; the input_hint per-row invariant)."""
    ref = reference.select(
        "repo", "path", "commit", F.sha2(F.col("content"), 256).alias("ref_sha")
    )
    return (
        corpus.join(ref, ["repo", "path", "commit"])
        .filter(F.col("content_sha256") != F.col("ref_sha"))
        .select("repo", "path", "commit", "content_sha256", "ref_sha")
    )
