"""Index-side phrase matching over positional postings.

When the index is built with ``positions=True``, phrases run directly
against the compressed postings — no re-tokenization of documents: decode
the phrase terms' postings per segment, intersect doc lists, verify
adjacency with numpy set membership (pos(t_{i+1}) == pos(t_i) + 1), exactly
Lucene's PhraseQuery contract the reference approximates two-phase
(LimitingFilterFactory.phraseFilter:177-192 = the AND pre-filter; this is
the exact phase).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..index.build import read_manifest, read_postings
from ..index.codec import decode_block, decode_positions


def _decode_with_positions(blocks) -> tuple[np.ndarray, list[np.ndarray]]:
    """term blocks → (doc_ids, per-doc position arrays)."""
    all_docs, all_pos = [], []
    for blk in blocks:
        doc_ids, tfs, _ = decode_block(blk)
        pos_bytes = blk["pos_bytes"] if not hasattr(blk, "pos_bytes") else blk.pos_bytes
        if pos_bytes is None:
            raise ValueError("index was built without positions=True")
        flat = decode_positions(bytes(pos_bytes), tfs)
        bounds = np.concatenate([[0], np.cumsum(tfs)]).astype(np.int64)
        all_docs.append(doc_ids)
        all_pos.extend(flat[bounds[i] : bounds[i + 1]] for i in range(len(doc_ids)))
    return (np.concatenate(all_docs) if all_docs else np.empty(0, np.int64)), all_pos


def phrase_docs_from_index(
    spark: SparkSession, index_dir: str, terms: list[str]
) -> DataFrame:
    """doc_ids containing ``terms`` at consecutive positions (slop=0)."""
    read_manifest(index_dir)  # validates the index exists
    postings = read_postings(spark, index_dir, sorted(set(terms))).select(
        "segment_id", "term", "blocks"
    )
    terms_seq = list(terms)

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        by_term = {r.term: r.blocks for r in pdf.itertuples()}
        if any(t not in by_term for t in terms_seq):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
        decoded = {t: _decode_with_positions(by_term[t]) for t in set(terms_seq)}
        # intersect doc lists across all phrase terms
        docs0 = decoded[terms_seq[0]][0]
        common = docs0
        for t in terms_seq[1:]:
            common = np.intersect1d(common, decoded[t][0], assume_unique=False)
        out = []
        index_of = {
            t: {int(d): i for i, d in enumerate(decoded[t][0])} for t in set(terms_seq)
        }
        for d in common.tolist():
            # start positions = positions of term0; phrase holds if some
            # chain p, p+1, ..., p+k-1 exists across the terms
            cand = decoded[terms_seq[0]][1][index_of[terms_seq[0]][d]]
            for offset, t in enumerate(terms_seq[1:], start=1):
                pos_t = decoded[t][1][index_of[t][d]]
                cand = cand[np.isin(cand + offset, pos_t)]
                if len(cand) == 0:
                    break
            if len(cand) > 0:
                out.append(d)
        return pd.DataFrame({"doc_id": pd.Series(out, dtype="int64")})

    return (
        postings.groupBy("segment_id")
        .applyInPandas(per_segment, "doc_id long")
        .dropDuplicates(["doc_id"])
    )
