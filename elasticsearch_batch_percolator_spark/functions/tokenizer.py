"""Deterministic analyzers (the engine's A1/A2 layer).

The reference builds a ``PerFieldAnalyzerWrapper`` so each field is analyzed
with its mapping's analyzer (RamDirectoryPercolatorIndex.java:68-81) and
indexes document batches into a transient in-memory Lucene index
(RamDirectoryPercolatorIndex.java:50-66). Here analysis is a pure Catalyst
expression — JVM-side, whole-stage-codegen'd, no Python in the hot path —
and the "index" is a postings DataFrame (index/build.py).

One tokenizer is shared verbatim between index build and query-side analysis
so BM25 ranks are reproducible (SURVEY.md §7 hard part 1).

Two analyzers:

- ``tokenize_ws``  — lowercase + split on single spaces. Byte-compatible with
  DuckDB's ``string_split(lower(text), ' ')`` so the driver's oracle SQL and
  the Spark plans agree token-for-token on the ``documents`` fixture.
- ``tokenize_code`` — lowercase + split on runs of non-[a-z0-9_]; identifiers
  like ``parse_request`` survive whole. Used for the source-code corpus
  (BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import TOKEN_PATTERN


def tokenize_ws(col: Column | str) -> Column:
    """array<string> of lowercase whitespace tokens; '' entries removed.

    array_remove (plain codegen expression) instead of a higher-order
    filter lambda; split on the literal single space (no regex engine).
    Identical output to DuckDB list_filter(string_split(lower(x),' '), ...).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.lower(c), " ", -1), "")


# every ASCII char outside [a-z0-9_] — printable punctuation plus the FULL
# control range \x00-\x1f and DEL \x7f (not just the whitespace controls:
# a stray NUL or ESC in misclassified binary content must split tokens
# exactly as the regex oracle does) — mapped to ' ' by translate(), a
# char-table lookup ~7x faster than the java.util.regex split on
# TOKEN_PATTERN at 10^7-token scale
_SEPARATORS = (
    "".join(chr(c) for c in range(0x20))
    + " !\"#$%&'()*+,-./:;<=>?@[\\]^`{|}~\x7f"
)


def tokenize_code(col: Column | str) -> Column:
    """array<string> of lowercase [a-z0-9_]+ identifier tokens.

    lower → translate(separators → space) → split(' ') → drop ''.
    Output equals splitting on the regex ``[^a-z0-9_]+`` for ASCII source
    text (non-ASCII codepoints survive inside tokens — acceptable for the
    code corpus and an order of magnitude cheaper; see tests for the
    equivalence property vs the regex reference).
    """
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(c)
    spaced = F.translate(lowered, _SEPARATORS, " " * len(_SEPARATORS))
    return F.array_remove(F.split(spaced, " ", -1), "")


def tokenize_code_regex(col: Column | str) -> Column:
    """Reference implementation of tokenize_code (regex split) — kept as the
    equivalence oracle; do not use in hot paths."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.lower(c), TOKEN_PATTERN, -1), "")


def explode_positions(df: DataFrame, tokens_col: str = "tokens", id_col: str = "doc_id") -> DataFrame:
    """(id, term, pos) rows — the raw material for posting lists.

    Position = 0-based token index, the same position Lucene records for
    phrase/span matching (reference PhraseQuery handling,
    LimitingFilterFactory.java:177-192).
    """
    return df.select(
        F.col(id_col),
        F.posexplode(F.col(tokens_col)).alias("pos", "term"),
    )
