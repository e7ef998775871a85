"""Arrow whole-segment encoder == per-term pandas encoder, bit-for-bit.

The round-4 `mapInArrow` encode path (build.py `encode_segments_arrow`)
replaces the object-string lexsort + per-term `encode_postings` loop with
Arrow dictionary-encode, one int lexsort, and a single whole-segment varint
pass sliced by offsets. Its parquet output must be byte-identical to the
pandas path on every field, including block payloads, with and without
positions — the two paths differ only in how, never in what.
"""

import os

import numpy as np
import pytest
from pyspark.sql import types as T

from elasticsearch_batch_percolator_spark.index.build import build_index, read_manifest


def _random_docs(spark, seed, n_docs, with_empty=True, sparse_ids=False):
    rng = np.random.default_rng(seed)
    vocab = np.array(
        ["tok%03d" % i for i in range(80)]
        + ["Zz", "aA", "éacute", "0num", "_und"]
        # multi-byte + supplementary-plane: the arrow path sorts by UTF-8
        # bytes, the pandas path by python str codepoints — identical
        # orders only because UTF-8 is order-preserving; pin that here
        + ["ÿ", "Ā", "￿", "\U00010000", "\U0001f600", "日本語"],
        dtype=object,
    )
    rows = []
    for i in range(n_docs):
        doc_id = i * 977 + 13 if sparse_ids else i
        n = int(rng.integers(0, 40))
        if with_empty and i % 17 == 0:
            n = 0
        toks = [str(v) for v in vocab[rng.integers(0, len(vocab), n)]]
        rows.append((doc_id, toks))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.StringType())),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _collect_index(spark, out_dir):
    rows = spark.read.parquet(os.path.join(out_dir, "postings")).collect()
    out = {}
    for r in rows:
        blocks = tuple(
            (
                b["max_doc"],
                b["max_norm"],
                b["n"],
                bytes(b["doc_bytes"]),
                bytes(b["tf_bytes"]),
                bytes(b["norm_bytes"]),
                None if b["pos_bytes"] is None else bytes(b["pos_bytes"]),
            )
            for b in r["blocks"]
        )
        out[(int(r["segment_id"]), r["term"])] = (int(r["df"]), int(r["cf"]), blocks)
    return out


@pytest.mark.parametrize("positions", [False, True])
@pytest.mark.parametrize("sparse_ids", [False, True])
def test_arrow_encoder_bit_identical(spark, tmp_path, positions, sparse_ids):
    docs = _random_docs(spark, seed=7 + positions + 2 * sparse_ids, n_docs=400,
                        sparse_ids=sparse_ids).cache()
    d_pd, d_ar = str(tmp_path / "pd"), str(tmp_path / "ar")
    build_index(spark, docs, d_pd, n_segments=5, positions=positions, encoder="pandas")
    build_index(spark, docs, d_ar, n_segments=5, positions=positions, encoder="arrow")
    a, b = _collect_index(spark, d_pd), _collect_index(spark, d_ar)
    assert set(a) == set(b)
    for k in a:
        assert a[k] == b[k], k
    ma, mb = read_manifest(d_pd), read_manifest(d_ar)
    assert (ma.n_docs, ma.avgdl, ma.boundaries) == (mb.n_docs, mb.avgdl, mb.boundaries)
    docs.unpersist()


def test_arrow_encoder_output_sorted_by_term(spark, tmp_path):
    """Parquet row-group pruning relies on term-sorted files."""
    docs = _random_docs(spark, seed=3, n_docs=200)
    out = str(tmp_path / "ix")
    build_index(spark, docs, out, n_segments=3)
    pdf = spark.read.parquet(os.path.join(out, "postings")).toPandas()
    for _, g in pdf.groupby("segment_id"):
        terms = list(g["term"])
        assert terms == sorted(terms)


def test_null_token_element_raises(spark, tmp_path):
    """The arrow encoder must fail loudly on null token elements (the
    pandas path TypeErrors in its object lexsort) — not cast NaN indices
    to garbage int codes."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.StringType(), True)),
        ]
    )
    docs = spark.createDataFrame([(0, ["a", None, "b"]), (1, ["b"])], schema)
    with pytest.raises(Exception, match="null token"):
        build_index(spark, docs, str(tmp_path / "ix"), n_segments=1)
