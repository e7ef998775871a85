"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting.

All pure Catalyst column expressions (whole-stage codegen, zero UDFs), and
all reproducible in ANSI SQL for the DuckDB oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "is", "and"],
    "code": ["def", "import", "class", "return", "self"],
    "query": ["select", "join", "group", "order", "filter"],
    "data": ["row", "column", "table", "vector", "batch"],
}

STOPWORDS = ["the", "a", "of", "is", "and", "to", "in"]


def token_count(tokens: Column | str) -> Column:
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.size(t).cast("long")


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish count: alnum runs + punctuation marks each count as one
    token (the whitespace+regex approximation of a BPE tokenizer)."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.size(F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda t: t != ""))
    punct = F.length(F.regexp_replace(c, "[a-zA-Z0-9 ]", ""))
    return (words + punct).cast("long")


def _marker_hits(tokens: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def lang_id(tokens: Column | str) -> Column:
    """argmax over marker-lexicon hit counts; deterministic 'und' when all
    zero, first-listed language wins ties (stable ordering)."""
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang, markers in LANG_MARKERS.items():
        hits = _marker_hits(t, markers)
        cond = hits > best_hits
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(cond, hits).otherwise(best_hits)
    return best_lang


def quality_score(text: Column | str, tokens: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: length band + stopword ratio +
    mean token length band (the length/punct/stopword-ratio family)."""
    c = F.col(text) if isinstance(text, str) else text
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    n = F.size(t)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_ratio = F.when(
        n > 0, F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x))) / n
    ).otherwise(F.lit(0.0))
    mean_len = F.when(n > 0, F.length(F.regexp_replace(c, " ", "")) / n).otherwise(F.lit(0.0))
    len_band = F.when((n >= 10) & (n <= 1000), F.lit(0.4)).otherwise(F.lit(0.0))
    stop_band = F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.5), F.lit(0.3)).otherwise(F.lit(0.0))
    wordlen_band = F.when((mean_len >= 2.0) & (mean_len <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
    return F.round(len_band + stop_band + wordlen_band, 4)


def fingerprint(tokens: Column | str) -> Column:
    """Key-collapsing fingerprint: md5 of the sorted distinct token set —
    equal iff two docs are bag-of-words-set identical."""
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(t))))
