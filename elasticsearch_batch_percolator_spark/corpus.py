"""Synthetic source-code corpus + corpus adapters.

The engine's primary input (BASELINE.json input_hint) is an Iceberg-style
table ``(repo, path, commit, lang, content)``. This sandbox has no external
data, so the corpus is synthesized deterministically (FIXTURES.md §1): every
column is a pure function of the row index ``i`` and a fixed seed, so any
partitioning / any cluster size produces the identical table — which is also
what makes the content-sha256 invariant (input_hint) checkable.

Token frequencies are Zipf-skewed on purpose: hot terms like ``def`` /
``import`` / ``the`` exercise the term-skew salting path at index-build time
(north_rule; SURVEY.md §7 step 7).

Generation runs distributed via ``mapInPandas`` over ``spark.range`` —
vectorized numpy inside, no per-row Python, no driver-side loop.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEED = 42

# ~100 identifier names (mirrors the closed name vocabulary of the
# reference's randomized test corpus, LimitingFilterFactoryTest.groovy.txt:371-473)
# + language keywords, Zipf-ranked: index 0 is the hottest term.
_KEYWORDS = [
    "the", "def", "import", "class", "return", "if", "else", "for", "while",
    "self", "int", "string", "void", "public", "static", "final", "func",
    "var", "let", "const", "new", "try", "catch", "raise", "yield",
]
_NAMES = [
    "parse", "request", "query", "index", "batch", "percolate", "match",
    "filter", "score", "token", "term", "doc", "shard", "merge", "reduce",
    "fetch", "highlight", "registry", "listener", "context", "builder",
    "service", "transport", "action", "response", "source", "mapper",
    "analyzer", "wildcard", "phrase", "span", "bool", "range", "limit",
    "sort", "count", "slot", "node", "cluster", "segment", "posting",
    "block", "delta", "varint", "encode", "decode", "buffer", "stream",
    "write", "read", "flush", "commit", "recover", "checkpoint", "manifest",
    "partition", "shuffle", "broadcast", "salt", "skew", "vector", "arrow",
    "pandas", "numpy", "spark", "frame", "column", "row", "schema", "table",
    "parquet", "iceberg", "lucene", "elastic", "search", "engine", "plugin",
    "handler", "worker", "thread", "pool", "cache", "evict", "load", "store",
    "hash", "join", "group", "agg", "window", "rank", "topk", "wand",
    "bm25", "idf", "tf", "norm", "avgdl", "fox", "youscan", "wolf",
]
VOCAB = _KEYWORDS + _NAMES  # hot keywords first → Zipf head
_LANGS = ["python", "java", "scala", "go", "js", "md"]
_EXTS = {"python": "py", "java": "java", "scala": "scala", "go": "go", "js": "js", "md": "md"}
_LANG_WEIGHTS = np.array([30, 20, 15, 15, 15, 5], dtype=np.float64)

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)


def _zipf_cdf(n: int, s: float = 1.1) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1, dtype=np.float64) ** s
    return np.cumsum(w) / w.sum()


_VOCAB_CDF = _zipf_cdf(len(VOCAB))
_LANG_CDF = np.cumsum(_LANG_WEIGHTS) / _LANG_WEIGHTS.sum()

_M1, _M2 = np.uint64(0x9E3779B97F4A7C15), np.uint64(0xBF58476D1CE4E5B9)


def _mix(i: np.ndarray, j: int) -> np.ndarray:
    """Deterministic 64-bit mix of (row index, stream id) — a splitmix64 step.
    uint64 wraparound is the point; silence numpy's overflow warning."""
    with np.errstate(over="ignore"):
        x = (i.astype(np.uint64) + np.uint64(j + 1) * _M1) * _M2
        x ^= x >> np.uint64(31)
        x *= _M1
        x ^= x >> np.uint64(29)
    return x


def _u01(i: np.ndarray, j: int) -> np.ndarray:
    return (_mix(i, j) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _full_vocab(vocab_size: int | None) -> np.ndarray:
    """Base vocabulary, optionally extended with a synthetic identifier tail
    (``v00125``...) so benchmarks can emulate realistic term selectivity —
    a 120-word vocabulary makes every multi-term query unrealistically
    dense; real code corpora have 10^6+ identifiers."""
    if not vocab_size or vocab_size <= len(VOCAB):
        return np.asarray(VOCAB, dtype=object)
    extra = [f"v{i:05d}" for i in range(len(VOCAB), vocab_size)]
    return np.asarray(VOCAB + extra, dtype=object)


def _gen_rows(ids: np.ndarray, vocab_size: int | None = None) -> pd.DataFrame:
    n = len(ids)
    vocab = _full_vocab(vocab_size)
    cdf = _VOCAB_CDF if len(vocab) == len(VOCAB) else _zipf_cdf(len(vocab))
    lang_ix = np.searchsorted(_LANG_CDF, _u01(ids, 0))
    lengths = 20 + (_mix(ids, 1) % np.uint64(180)).astype(np.int64)
    max_len = int(lengths.max()) if n else 0
    # token matrix: every column j is a Zipf draw from stream j+16
    tok_ix = np.empty((n, max_len), dtype=np.int64)
    for j in range(max_len):
        tok_ix[:, j] = np.searchsorted(cdf, _u01(ids, 16 + j))
    contents = [" ".join(vocab[tok_ix[r, : lengths[r]]]) for r in range(n)]
    langs = [_LANGS[k] for k in lang_ix]
    commits = [hashlib.sha256(f"commit{i}".encode()).hexdigest()[:40] for i in ids]
    return pd.DataFrame(
        {
            # doc_id = generator row index: dense, stable under any
            # partitioning, no global-window bottleneck at scale
            "doc_id": ids.astype(np.int64),
            "repo": [f"org{i % 7}/repo{i % 53}" for i in ids],
            "path": [
                f"src/d{int(_mix(np.array([i]), 2)[0] % 20)}/f{i}.{_EXTS[lang]}"
                for i, lang in zip(ids, langs)
            ],
            "commit": commits,
            "lang": langs,
            "content": contents,
        }
    )


def synth_corpus(
    spark: SparkSession,
    n_docs: int,
    partitions: int | None = None,
    vocab_size: int | None = None,
) -> DataFrame:
    """Deterministic corpus of ``n_docs`` source files, generated in parallel."""
    partitions = partitions or max(1, n_docs // 25_000) * 4

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _gen_rows(b["id"].to_numpy(), vocab_size)

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=CORPUS_SCHEMA)
    )


def with_doc_ids(corpus: DataFrame) -> DataFrame:
    """Stable doc_id = dense rank over (repo, path, commit) (FIXTURES.md §1)
    for corpora that arrive WITHOUT ids.

    NOTE: a global row_number is a single-partition sort — fine for
    re-keying modest inputs, wrong at 10^12 files. At scale, ids should come
    from the source (synth_corpus emits them) or from a two-pass
    per-partition-offset assignment; this helper exists for parity with the
    fixture definition.
    """
    from pyspark.sql import Window

    w = Window.orderBy("repo", "path", "commit")
    return corpus.withColumn("doc_id", F.row_number().over(w).cast("long") - 1)


def with_sha256(df: DataFrame, col: str = "content") -> DataFrame:
    """Per-row invariant column (input_hint: content sha256 equality)."""
    return df.withColumn("content_sha256", F.sha2(F.col(col), 256))


def documents_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter: the driver's ``documents`` fixture viewed as a corpus.

    ``documents.parquet`` is ``(doc_id, text, lang, source, n_chars)``; the
    engine only needs (doc_id, content).
    """
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.col("text").alias("content"), "lang", "source", "n_chars")
    )
