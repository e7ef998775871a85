from .stats import corpus_stats, term_frequencies, doc_lengths, doc_freq  # noqa: F401
from .bm25 import bm25_score_col, bm25_topk, score_terms  # noqa: F401
