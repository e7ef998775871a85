"""Slow, obviously-correct Python BM25 oracle (SURVEY.md §4 end note).

The rank-identity contract (north_rule) is checked against this reference
implementation: same tokenizer, float64, per-doc term contributions summed
in sorted-term order for deterministic accumulation.
"""

from __future__ import annotations

import math
from collections import Counter

K1, B = 1.2, 0.75


def tokenize_ws(text: str) -> list[str]:
    return [t for t in text.lower().split(" ") if t]


def bm25_oracle(
    docs: dict[int, list[str]], query_terms: list[str], k1: float = K1, b: float = B
) -> dict[int, float]:
    """doc_id -> BM25 score for docs containing >=1 query term."""
    n = len(docs)
    dl = {d: len(toks) for d, toks in docs.items()}
    avgdl = sum(dl.values()) / n if n else 0.0
    tfs = {d: Counter(toks) for d, toks in docs.items()}
    df = Counter()
    for d, c in tfs.items():
        for t in set(c):
            df[t] += 1
    scores: dict[int, float] = {}
    for d, c in tfs.items():
        s = 0.0
        for t in sorted(set(query_terms)):
            tf = c.get(t, 0)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl[d] / avgdl))
            s += idf * norm
        if s > 0.0:
            scores[d] = s
    return scores


def topk_oracle(scores: dict[int, float], k: int) -> list[tuple[int, float]]:
    return sorted(scores.items(), key=lambda kv: (-round(kv[1], 4), kv[0]))[:k]
